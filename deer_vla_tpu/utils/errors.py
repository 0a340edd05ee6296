"""Failure-detection helpers.

The reference decorates entry mains with torch.distributed.elastic's
``@record`` (train_calvin_post_strategy.py:29, eval_calvin.py:33) so worker
crashes propagate a structured error file to the launcher.  JAX has no
launcher contract; this ``@record`` writes the same kind of structured crash
report (process index, host, traceback) to a JSONL file before re-raising,
so multi-host failures are attributable post-mortem.
"""

from __future__ import annotations

import functools
import json
import os
import socket
import sys
import time
import traceback
from typing import Callable, Optional


def record(fn: Optional[Callable] = None, *,
           error_file: Optional[str] = None):
    """Decorator: on exception, append a structured crash record and re-raise.

    The target file comes from (in order) the explicit argument, the
    DEER_ERROR_FILE env var, or ./deer_crash.jsonl.
    """
    def wrap(f):
        @functools.wraps(f)
        def inner(*args, **kwargs):
            # every CLI main passes through here before its first jit:
            # central hook for the opt-in persistent compilation cache
            # (DEER_COMPILE_CACHE; utils/compile_cache.py)
            from deer_vla_tpu.utils.compile_cache import \
                maybe_enable_compile_cache
            maybe_enable_compile_cache()
            try:
                return f(*args, **kwargs)
            except BaseException as e:
                if isinstance(e, (KeyboardInterrupt, SystemExit)):
                    raise
                path = (error_file or os.environ.get("DEER_ERROR_FILE")
                        or "deer_crash.jsonl")
                rec = {
                    "ts": time.time(),
                    "host": socket.gethostname(),
                    "pid": os.getpid(),
                    "entry": f"{f.__module__}.{f.__qualname__}",
                    "argv": sys.argv,
                    "error": repr(e),
                    "traceback": traceback.format_exc(),
                }
                try:
                    import jax
                    rec["process_index"] = jax.process_index()
                except Exception:
                    pass
                try:
                    with open(path, "a") as fh:
                        fh.write(json.dumps(rec) + "\n")
                    print(f"[deer] crash record appended to {path}",
                          file=sys.stderr)
                except OSError:
                    pass
                raise
        return inner

    return wrap(fn) if fn is not None else wrap
