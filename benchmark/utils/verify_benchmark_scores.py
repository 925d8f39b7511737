"""CI score gates (same thresholds as the reference's
benchmark/utils/verify_benchmark_scores.py:6-44)."""

import json

import click


def verify_det(data):
    scores = data["metrics"]["surya"]
    if scores["precision"] <= 0.9 or scores["recall"] <= 0.9:
        raise ValueError("Detection scores do not meet the required threshold")


def verify_rec(data):
    if data["surya"]["avg_score"] <= 0.9:
        raise ValueError("Recognition scores do not meet the required threshold")


def verify_layout(data):
    for layout_type, metrics in data["metrics"].items():
        if layout_type == "List":  # Lists don't appear in the early rows
            continue
        if metrics["precision"] <= 0.6 or metrics["recall"] <= 0.6:
            raise ValueError("Layout scores do not meet the required threshold")


def verify_order(data):
    if data["mean_accuracy"] < 0.75:
        raise ValueError("Ordering scores do not meet the required threshold")


def verify_table_rec(data):
    if data["surya"]["mean_row_iou"] < 0.75 or data["surya"]["mean_col_iou"] < 0.75:
        raise ValueError("Table rec scores do not meet the required threshold")


def verify_texify(data):
    if data["scores"] > 0.2:
        raise ValueError("Texify scores do not meet the required threshold")


VERIFIERS = {
    "detection": verify_det,
    "recognition": verify_rec,
    "layout": verify_layout,
    "ordering": verify_order,
    "table_recognition": verify_table_rec,
    "texify": verify_texify,
}


@click.command(help="Verify benchmark scores against the CI gates.")
@click.argument("file_path", type=str)
@click.option("--bench_type", type=str, default="detection")
def main(file_path: str, bench_type: str):
    with open(file_path) as f:
        data = json.load(f)
    if bench_type not in VERIFIERS:
        raise ValueError(f"Invalid benchmark type {bench_type}")
    VERIFIERS[bench_type](data)
    print(f"{bench_type} scores pass")


if __name__ == "__main__":
    main()
