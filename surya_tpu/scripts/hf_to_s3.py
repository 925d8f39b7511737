"""Maintainer utility: mirror a HuggingFace checkpoint into the S3-compatible
weight bucket with the manifest the loaders expect (reference:
surya/scripts/hf_to_s3.py). boto3 / huggingface_hub are optional deps."""

from __future__ import annotations

import datetime
import json
import shutil
import tempfile
from pathlib import Path

import click

S3_API_URL = "https://1afbe4656a6b40d982ab5e730a39f6b9.r2.cloudflarestorage.com"


@click.command(help="Upload a HuggingFace checkpoint to the S3 weight bucket.")
@click.argument("hf_repo_id", type=str)
@click.argument("s3_path", type=str)
@click.option("--bucket_name", type=str, default="datalab")
@click.option("--access_key_id", type=str, default="<access_key_id>")
@click.option("--access_key_secret", type=str, default="<access_key_secret>")
@click.option("--suffix", type=str, default="")
def main(hf_repo_id: str, s3_path: str, bucket_name: str, access_key_id: str, access_key_secret: str, suffix: str):
    try:
        import boto3
        from huggingface_hub import snapshot_download
        from tqdm import tqdm
    except ImportError as e:
        raise ImportError("hf_to_s3 needs boto3 and huggingface_hub") from e

    curr_date = datetime.datetime.now().strftime("%Y_%m_%d")
    s3_path = f"{s3_path}/{curr_date}"
    if suffix:
        s3_path = f"{s3_path}_{suffix}"

    # stage into a temp dir: the snapshot lives inside the shared HF hub
    # cache (symlinked blobs) — writing the manifest there or deleting it
    # would corrupt the cache for other consumers
    download_folder = Path(snapshot_download(repo_id=hf_repo_id))
    with tempfile.TemporaryDirectory() as tmp:
        staging = Path(tmp)
        for f in download_folder.glob("*"):
            if f.is_file():
                shutil.copyfile(f, staging / f.name)
        contained_files = [f.name for f in staging.glob("*")]
        # the manifest drives the loaders' parallel fetch (common/s3.py)
        with open(staging / "manifest.json", "w") as fh:
            json.dump({"files": contained_files}, fh)

        s3_client = boto3.client(
            service_name="s3",
            endpoint_url=S3_API_URL,
            aws_access_key_id=access_key_id,
            aws_secret_access_key=access_key_secret,
            region_name="auto",
        )
        for file_path in tqdm(staging.glob("*"), desc="Uploading files", unit="file"):
            try:
                s3_client.upload_file(str(file_path), bucket_name, f"{s3_path}/{file_path.name}")
            except Exception as e:
                print(f"Error uploading {file_path}: {e}")
    print(f"Uploaded files to {s3_path}")


if __name__ == "__main__":
    main()
