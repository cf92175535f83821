"""S1: HTTP download of the public IMDb datasets with a Last-Modified cache
(reference: pimdb/common.py:121-180).  Driver-side by design — fetching 7
gzipped files is not a distributed job; the cache file skips unchanged
datasets exactly like the reference's .pimdb_last_modified.json."""

from __future__ import annotations

import json
import os
import urllib.request

IMDB_DATASET_URL = "https://datasets.imdbws.com/{dataset}.tsv.gz"
LAST_MODIFIED_CACHE = ".pimdb_spark_last_modified.json"


def _cache_path(target_dir: str) -> str:
    return os.path.join(target_dir, LAST_MODIFIED_CACHE)


def _read_cache(target_dir: str) -> dict:
    try:
        with open(_cache_path(target_dir)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def download_dataset(dataset: str, target_dir: str, only_if_newer: bool = True) -> str:
    """Stream one dataset to target_dir, skipping if Last-Modified is
    unchanged.  Returns the local path."""
    os.makedirs(target_dir, exist_ok=True)
    url = IMDB_DATASET_URL.format(dataset=dataset)
    target = os.path.join(target_dir, f"{dataset}.tsv.gz")
    cache = _read_cache(target_dir)

    req = urllib.request.Request(url, method="HEAD")
    with urllib.request.urlopen(req) as head:
        last_modified = head.headers.get("Last-Modified", "")
    if (
        only_if_newer
        and os.path.exists(target)
        and last_modified
        and cache.get(dataset) == last_modified
    ):
        return target

    with urllib.request.urlopen(url) as resp, open(target, "wb") as out:
        while chunk := resp.read(8192):
            out.write(chunk)
    cache[dataset] = last_modified
    with open(_cache_path(target_dir), "w") as f:
        json.dump(cache, f)
    return target
