"""Numpy oracle for first-match inner-join semantics.

Replicates the reference's semantics contract (SURVEY.md §3): each probe key
yields at most one output row; count = number of probe occurrences whose key
exists in the build side; the matched value comes from exactly one of the
duplicate build rows (ours: first occurrence in (home-group, key) sort order,
so value parity is asserted only when build keys are unique — same situation
as the reference, whose duplicate winner is race-dependent).
"""

from __future__ import annotations

import numpy as np


def oracle_count(build_keys: np.ndarray, probe_keys: np.ndarray) -> int:
    uniq = np.unique(build_keys)
    return int(np.isin(probe_keys, uniq).sum())


def oracle_materialize(build_keys, build_values, probe_keys):
    """Returns (count, matched_probe_keys, matched_values or None).

    Values are returned only when build keys are unique (deterministic).
    Output rows follow probe order (our engine's deterministic order).
    """
    uniq, first_idx = np.unique(build_keys, return_index=True)
    mask = np.isin(probe_keys, uniq)
    out_keys = probe_keys[mask]
    if len(uniq) == len(build_keys):
        pos = np.searchsorted(uniq, out_keys)
        out_vals = build_values[first_idx[pos]]
    else:
        out_vals = None
    return int(mask.sum()), out_keys, out_vals
