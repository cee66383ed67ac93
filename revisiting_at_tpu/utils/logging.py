"""Run-directory naming, params.json, and JSON-lines metric logging.

Parity with the reference's logging subsystem (main.py:1084-1126): run dir
named from arch/flags/timestamp, full config dumped to params.json (the
eval contract), JSONL `log` file with absolute + relative timestamps.
"""

from __future__ import annotations

import json
import time
from pathlib import Path


class RunLogger:
    def __init__(self, folder: str, run_name: str):
        self.dir = Path(folder) / run_name
        self.dir.mkdir(parents=True, exist_ok=True)
        self.log_path = self.dir / "log"
        self.start_time = time.time()

    def log(self, content: dict) -> None:
        cur_time = time.time()
        entry = {
            "timestamp": cur_time,
            "relative_time": cur_time - self.start_time,
            **content,
        }
        with open(self.log_path, "a") as f:
            f.write(json.dumps(entry, default=str) + "\n")
        print(json.dumps(entry, default=str), flush=True)


def make_run_name(arch: str, attack: str, not_original: int, updated: int, addendum: str = "") -> str:
    """Reference-style run folder name (main.py:1092-1099)."""
    stamp = time.strftime("%Y-%m-%d_%H:%M:%S")
    parts = [
        f"model_{stamp}",
        arch,
        f"upd_{updated}",
        f"not_orig_{not_original}",
        f"adv_{attack}",
    ]
    if addendum:
        parts.append(addendum)
    return "_".join(parts)


class EvalLogger:
    """Append-only text logger (reference AA_eval.py:36-47)."""

    def __init__(self, log_path: str | None):
        self.log_path = log_path
        if log_path:
            Path(log_path).parent.mkdir(parents=True, exist_ok=True)

    def log(self, msg: str) -> None:
        print(msg, flush=True)
        if self.log_path:
            with open(self.log_path, "a") as f:
                f.write(str(msg) + "\n")
