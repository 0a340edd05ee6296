"""Training heartbeat — liveness signal for the elastic launcher.

The reference's failure story is torchrun + @record (error propagation, no
restarts; SURVEY §5.3).  Here the trainer emits a heartbeat file that
scripts/launch_elastic.py watches: a crashed OR hung worker (no beat within
the timeout) gets its whole process group restarted, and checkpoint
auto-resume (train/checkpoint.find_latest_checkpoint) makes the restart
cheap.  File-based so it works on shared filesystems across hosts.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class Heartbeat:
    """Rate-limited liveness file writer.

    beat() writes {ts, pid, **info} to ``path`` at most every
    ``min_interval`` seconds; atomic rename so readers never see a torn
    file.  A no-op when ``path`` is falsy (heartbeating disabled).
    """

    def __init__(self, path: Optional[str], min_interval: float = 5.0):
        self.path = path
        self.min_interval = min_interval
        self._last = 0.0
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def beat(self, **info) -> bool:
        if not self.path:
            return False
        now = time.time()
        if now - self._last < self.min_interval:
            return False
        self._last = now
        tmp = f"{self.path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"ts": now, "pid": os.getpid(), **info}, f)
        os.replace(tmp, self.path)
        return True


def read_heartbeat(path: str) -> Optional[dict]:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def age_seconds(path: str) -> Optional[float]:
    hb = read_heartbeat(path)
    if hb is None or "ts" not in hb:
        return None
    return time.time() - float(hb["ts"])
