"""Minimal pydantic-settings stub for importing the reference package in tests."""

from pydantic import BaseModel


class BaseSettings(BaseModel):
    model_config = {"extra": "ignore", "arbitrary_types_allowed": True}

    def __init_subclass__(cls, **kwargs):
        # Drop the reference's `class Config` (env_file etc.) — tests don't
        # read env through the reference settings object.
        cls.Config = type("Config", (), {})
        super().__init_subclass__(**kwargs)
