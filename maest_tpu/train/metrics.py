"""Quality metrics (host-side).

Macro average-precision and ROC-AUC via sklearn, as in the reference
(reference: models/module.py:190-191, ex_tl.py:132-133). Multi-host runs
gather per-host outputs with ``jax.experimental.multihost_utils`` before
scoring on process 0 (the TPU equivalent of Lightning's ``all_gather``,
reference: models/module.py:163-180).
"""

from __future__ import annotations

import numpy as np


def macro_ap_roc(y_true: np.ndarray, y_score: np.ndarray) -> tuple[float, float]:
    from sklearn import metrics

    y_true = np.asarray(y_true)
    y_score = np.asarray(y_score)
    # drop classes with no positives or no negatives (undefined AUC)
    pos = y_true.sum(axis=0)
    valid = (pos > 0) & (pos < len(y_true))
    if not valid.any():
        # tiny/degenerate eval subsets (e.g. limit_val_batches smoke runs)
        # can leave no scoreable class; sklearn rejects zero-width inputs
        return float("nan"), float("nan")
    if not valid.all():
        y_true = y_true[:, valid]
        y_score = y_score[:, valid]
    ap = metrics.average_precision_score(y_true, y_score, average="macro")
    roc = metrics.roc_auc_score(y_true, y_score, average="macro")
    return float(ap), float(roc)


def gather_across_hosts(arr: np.ndarray) -> np.ndarray:
    """Concatenate a per-host array across processes (no-op single-host)."""
    import jax

    if jax.process_count() == 1:
        return arr
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(arr)).reshape(
        (-1,) + arr.shape[1:]
    )
