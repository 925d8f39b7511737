"""Minimal python-dotenv stub for importing the reference package in tests."""


def find_dotenv(name=".env", *a, **k):
    return ""


def load_dotenv(*a, **k):
    return False
