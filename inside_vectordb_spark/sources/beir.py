"""BEIR dataset download (S1, ``000-get_data.py:67-84``).

Out-of-engine data landing: fetch the benchmark zip over HTTP and
unzip it next to the engine's other landed files — stdlib only
(urllib + zipfile), no third-party downloader. Network access is an
environment concern, so tests cover URL construction and the
already-downloaded short-circuit, not the fetch itself.
"""

from __future__ import annotations

import os
import shutil
import tempfile
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
    (the reference's cache check).

    Extraction is ATOMIC (extract-to-temp, rename into place — the
    same commit pattern the engine's index builders use): the cache
    check is ``isdir``, so extracting straight into the final
    location would make a killed/ENOSPC'd extraction look complete
    forever (review r7)."""
    out_dir = os.path.join(root, name)
    if os.path.isdir(out_dir):
        return out_dir
    os.makedirs(root, exist_ok=True)
    zip_path = os.path.join(root, f"{name}.zip")
    stage = tempfile.mkdtemp(prefix=f".{name}_extract_", dir=root)
    try:
        # the download lives INSIDE the cleanup scope: a dropped
        # connection mid-fetch of a multi-GB zip must not leave a
        # truncated {name}.zip on disk (review r8)
        urllib.request.urlretrieve(beir_dataset_url(name), zip_path)  # noqa: S310
        with zipfile.ZipFile(zip_path) as zf:
            zf.extractall(stage)
        # BEIR zips contain a single top-level '{name}/' directory
        staged = os.path.join(stage, name)
        src = staged if os.path.isdir(staged) else stage
        os.rename(src, out_dir)
    finally:
        shutil.rmtree(stage, ignore_errors=True)
        if os.path.exists(zip_path):
            os.remove(zip_path)
    return out_dir
