"""Reader parameter helpers (reference depthmotionnet/datareader/helpers.py)."""

from __future__ import annotations

from typing import List


def add_sources(params: dict, dataset_files: List[str], weight: float = 1.0,
                normalize: bool = True, concatenate: bool = False) -> dict:
    """Append h5 sources with sampling weights to a reader params dict
    (reference datareader/helpers.py:19-58).

    normalize divides the weight by the number of files; concatenate joins
    all files into one ';'-separated source instead.
    """
    params.setdefault("source", [])
    if concatenate:
        params["source"].append({"path": ";".join(dataset_files)})
    else:
        for item in dataset_files:
            w = weight / len(dataset_files) if normalize else weight
            params["source"].append({"path": item, "weight": w})
    return params
