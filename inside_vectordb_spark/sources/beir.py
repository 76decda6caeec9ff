"""BEIR dataset download (S1, ``000-get_data.py:67-84``).

Out-of-engine data landing: fetch the benchmark zip over HTTP and
unzip it next to the engine's other landed files — stdlib only
(urllib + zipfile), no third-party downloader. Network access is an
environment concern, so tests cover URL construction and the
already-downloaded short-circuit, not the fetch itself.
"""

from __future__ import annotations

import os
import urllib.request
import zipfile

BEIR_BASE_URL = (
    "https://public.ukp.informatik.tu-darmstadt.de/thakur/BEIR/datasets"
)


def beir_dataset_url(name: str) -> str:
    return f"{BEIR_BASE_URL}/{name}.zip"


def download_beir_dataset(name: str, root: str) -> str:
    """Fetch + unzip ``{name}`` under ``{root}``; returns the dataset
    directory. Skips the download when the directory already exists
    (the reference's cache check)."""
    out_dir = os.path.join(root, name)
    if os.path.isdir(out_dir):
        return out_dir
    os.makedirs(root, exist_ok=True)
    zip_path = os.path.join(root, f"{name}.zip")
    urllib.request.urlretrieve(beir_dataset_url(name), zip_path)  # noqa: S310
    with zipfile.ZipFile(zip_path) as zf:
        zf.extractall(root)
    os.remove(zip_path)
    return out_dir
