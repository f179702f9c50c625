"""Shared helpers for the executed reference-parity suites: one driver
invocation contract and one metric-reconstruction definition, so the
memm/zarr/preprocess modules cannot silently drift apart."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def run_ref_driver(cfg: dict, root) -> None:
    """Write ``cfg`` and execute tests/ref_driver.py on it, asserting
    the subprocess's own OK sentinel."""
    cfg_path = Path(root) / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    env = dict(os.environ)  # ref_driver never imports jax; inert here
    proc = subprocess.run(
        [sys.executable, str(REPO / "tests" / "ref_driver.py"),
         str(cfg_path)], env=env, capture_output=True, text=True,
        timeout=900)
    assert proc.returncode == 0, \
        f"ref_driver failed:\nSTDOUT:{proc.stdout[-3000:]}\n" \
        f"STDERR:{proc.stderr[-3000:]}"
    assert "REF_DRIVER_OK" in proc.stdout


def pr_f1_ap(labels, preds, pos_label):
    """(max_F1, AP) via sklearn's curve — ONE definition of the metric
    reconstruction both eval-parity tests hold the pipeline to."""
    from sklearn.metrics import precision_recall_curve
    prec, rec, _ = precision_recall_curve(labels, preds,
                                          pos_label=pos_label)
    denom = rec + prec
    f1 = np.divide(2 * rec * prec, denom, out=np.zeros_like(denom),
                   where=denom != 0)
    ap = -np.sum(np.diff(rec) * prec[:-1])
    return float(f1.max()), float(ap)
