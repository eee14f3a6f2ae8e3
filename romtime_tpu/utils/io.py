"""Checkpoint/report IO.

The reference persists bases and solutions with pickle and μ-spaces with
ujson (reference: utils.py:248-279, rom/hrom.py:137-227). Arrays here go to
deterministic ``.npz`` containers by default, with pickle kept for
API-compatible paths; JSON uses the stdlib.
"""

import json
import pickle

import numpy as np
import pandas as pd


def read_pickle(path):
    with open(path, mode="rb") as fp:
        return pickle.load(fp)


def dump_pickle(path, obj):
    with open(path, mode="wb") as fp:
        pickle.dump(obj, fp)


def dump_json(path, obj):
    with open(path, mode="w") as fp:
        json.dump(obj, fp, default=_json_default)


def read_json(path):
    with open(path, mode="r") as fp:
        return json.load(fp)


def dump_csv(path, obj):
    pd.DataFrame(obj).to_csv(path)


def dump_npz(path, **arrays):
    """Write named arrays to a compressed npz container."""
    np.savez_compressed(path, **arrays)


def read_npz(path):
    """Load an npz container as a dict of arrays."""
    with np.load(path, allow_pickle=False) as data:
        return {k: data[k] for k in data.files}


def _json_default(obj):
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, (np.integer,)):
        return int(obj)
    raise TypeError(f"Cannot serialize {type(obj)} to JSON.")
