"""Download/extract helpers — reference ``torch_geometric/data/
{download,extract}.py``.  This image has no egress; ``download_url`` keeps
the reference's API (skips when the file exists, logs the url) and raises a
clear RuntimeError when the network is unreachable, pointing at the local-
files route the datasets all support."""
from __future__ import annotations

import os
import os.path as osp


def download_url(url: str, folder: str, *, log: bool = True,
                 filename: str | None = None) -> str:
    """reference ``download.py:download_url`` — fetch ``url`` into
    ``folder`` (skipping if present); returns the local path."""
    name = filename or url.rpartition("/")[2].split("?")[0]
    path = osp.join(folder, name)
    if osp.exists(path):
        if log:
            print(f"Using existing file {name}")
        return path
    if log:
        print(f"Downloading {url}")
    os.makedirs(folder, exist_ok=True)
    import urllib.request

    try:
        with urllib.request.urlopen(url, timeout=60) as resp:
            blob = resp.read()
    except Exception as exc:
        raise RuntimeError(
            f"could not download {url} ({exc}); place {name} under {folder} "
            "manually — every dataset in this package also reads local files"
        ) from exc
    with open(path, "wb") as f:
        f.write(blob)
    return path


def extract_tar(path: str, folder: str, mode: str = "r:gz",
                log: bool = True) -> None:
    """reference ``extract.py:extract_tar``."""
    import tarfile

    if log:
        print(f"Extracting {path}")
    with tarfile.open(path, mode) as tar:
        tar.extractall(folder)


def extract_zip(path: str, folder: str, log: bool = True) -> None:
    """reference ``extract.py:extract_zip``."""
    import zipfile

    if log:
        print(f"Extracting {path}")
    with zipfile.ZipFile(path, "r") as z:
        z.extractall(folder)


def extract_gz(path: str, folder: str, log: bool = True) -> None:
    """reference ``extract.py:extract_gz`` — decompress ``x.gz`` → ``x``."""
    import gzip
    import shutil

    if log:
        print(f"Extracting {path}")
    out = osp.join(folder, osp.basename(path).removesuffix(".gz"))
    with gzip.open(path, "rb") as src, open(out, "wb") as dst:
        shutil.copyfileobj(src, dst)


def extract_bz2(path: str, folder: str, log: bool = True) -> None:
    """reference ``extract.py:extract_bz2``."""
    import bz2
    import shutil

    if log:
        print(f"Extracting {path}")
    out = osp.join(folder, osp.basename(path).removesuffix(".bz2"))
    with bz2.open(path, "rb") as src, open(out, "wb") as dst:
        shutil.copyfileobj(src, dst)
