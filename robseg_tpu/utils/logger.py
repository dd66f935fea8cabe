"""Print + append-to-file logger; parity ``semseg/utils/utils.py:311-320``."""

from __future__ import annotations

import os
import time
from typing import Optional


class Logger:
    def __init__(self, log_path: Optional[str] = None):
        self.log_path = log_path
        if log_path:
            os.makedirs(os.path.dirname(os.path.abspath(log_path)),
                        exist_ok=True)

    def log(self, msg: str) -> None:
        print(msg, flush=True)
        if self.log_path:
            with open(self.log_path, "a") as f:
                f.write(f"{msg}\n")

    def log_timed(self, msg: str) -> None:
        self.log(f"[{time.strftime('%H:%M:%S')}] {msg}")
