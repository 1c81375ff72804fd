"""Committed learning-results ledger (VERDICT r4 #6).

Every ``benchmarks/check_*_tpu.py`` harness appends ONE JSON line per
run to ``RESULTS.jsonl`` at the repo root, making learning/accuracy
claims diffable round-over-round the way ``BENCH_r*.json`` makes perf
claims diffable. Docs cite ledger lines, not prose numbers.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

LEDGER = Path(__file__).resolve().parents[2] / "RESULTS.jsonl"


def record(check: str, payload: dict) -> dict:
    """Append ``{check, date, **payload}`` to RESULTS.jsonl and print it
    (preserving the scripts' one-JSON-line stdout contract). Ledger
    write failures never kill a 40-minute check run."""
    entry = {"check": check,
             "date": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
             **payload}
    line = json.dumps(entry)
    try:
        with open(LEDGER, "a") as f:
            f.write(line + "\n")
    except OSError as exc:
        print(f"[results] ledger write failed: {exc}", flush=True)
    print(line, flush=True)
    return entry
