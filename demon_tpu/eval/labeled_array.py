"""A minimal labeled N-D array — the xarray.DataArray subset the
evaluation harness needs (dims, coords, .loc assignment/selection, attrs,
JSON round trip in xarray's to_dict layout).

The reference serializes its 5-D results DataArray with
xarray.DataArray.to_dict -> json (evaluate_to_xarray.py:33-41); this class
reads and writes the same structure, so result files interoperate with
xarray where it is installed.
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Sequence

import numpy as np


class LabeledArray:
    def __init__(self, data: np.ndarray, dims: Sequence[str],
                 coords: Dict[str, Sequence], attrs: Dict[str, Any] = None):
        self.data = np.asarray(data)
        self.dims = tuple(dims)
        if self.data.ndim != len(self.dims):
            raise ValueError("dims/data rank mismatch")
        self.coords = {d: list(coords[d]) for d in self.dims}
        for d in self.dims:
            if len(self.coords[d]) != self.data.shape[self.dims.index(d)]:
                raise ValueError(f"coord length mismatch on {d}")
        self.attrs = dict(attrs or {})
        self._index = {d: {c: i for i, c in enumerate(self.coords[d])}
                       for d in self.dims}

    # -- label-based indexing ------------------------------------------
    def _resolve(self, labels):
        if not isinstance(labels, tuple):
            labels = (labels,)
        idx = []
        for d, lab in zip(self.dims, labels):
            if isinstance(lab, slice):
                idx.append(lab)
            else:
                idx.append(self._index[d][lab])
        return tuple(idx)

    def set(self, labels, value):
        self.data[self._resolve(labels)] = value

    def get(self, labels):
        return self.data[self._resolve(labels)]

    def sel(self, **kw) -> "LabeledArray":
        """Select by coordinate labels along named dims, dropping the
        selected dims (like xarray .sel with scalars)."""
        idx: List[Any] = [slice(None)] * self.data.ndim
        drop = []
        for d, lab in kw.items():
            i = self.dims.index(d)
            idx[i] = self._index[d][lab]
            drop.append(d)
        data = self.data[tuple(idx)]
        dims = [d for d in self.dims if d not in drop]
        coords = {d: self.coords[d] for d in dims}
        return LabeledArray(data, dims, coords, self.attrs)

    def mean(self, dim: str) -> "LabeledArray":
        i = self.dims.index(dim)
        data = np.nanmean(self.data, axis=i)
        dims = [d for d in self.dims if d != dim]
        return LabeledArray(data, dims,
                            {d: self.coords[d] for d in dims}, self.attrs)

    # -- xarray-compatible serialization --------------------------------
    def to_dict(self) -> dict:
        return {
            "dims": list(self.dims),
            "attrs": _jsonify(self.attrs),
            "data": self.data.tolist(),
            "coords": {
                d: {"dims": [d], "attrs": {}, "data": _jsonify(self.coords[d])}
                for d in self.dims
            },
            "name": None,
        }

    @staticmethod
    def from_dict(obj: dict) -> "LabeledArray":
        dims = obj["dims"]
        coords = {d: obj["coords"][d]["data"] for d in dims}
        return LabeledArray(np.asarray(obj["data"], dtype=np.float64),
                            dims, coords, obj.get("attrs", {}))


def _jsonify(v):
    if isinstance(v, dict):
        return {k: _jsonify(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_jsonify(x) for x in v]
    if isinstance(v, np.ndarray):
        return v.tolist()
    if isinstance(v, (np.bool_, np.integer, np.floating)):
        return v.item()
    return v


def write_labeled_array_json(data: LabeledArray, out_file: str):
    """(reference write_xarray_json, evaluate_to_xarray.py:33-36)"""
    with open(out_file, "w") as f:
        json.dump(data.to_dict(), f)


def read_labeled_array_json(in_file: str) -> LabeledArray:
    with open(in_file, "r") as f:
        return LabeledArray.from_dict(json.load(f))
