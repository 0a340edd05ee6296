"""HTTP action-serving host: raw camera frames + instruction in, 7-DoF
actions out, over any number of independent robot streams.

The reference has no serving daemon at all — deploying it means re-running
the Python eval stack per host (eval_calvin.py:543-577) with the CALVIN
harness around it.  Here the serving unit is a stdlib HTTP server wrapping
one shared dynamic-exit engine (eval/scan_policy.ScanDeerPolicy, or the
AOT artifact via serving/export.ExportedScanPolicy): weights and compiled
programs are shared across streams; per-stream state (LSTM carry, rolling
frame window, stage-reuse step counter) lives in a cheap per-stream
adapter view.

Protocol (JSON bodies; images are base64 raw bytes + shape):

  GET  /healthz            -> {ok, model, exits, streams, steps}
  POST /v1/reset           {"stream": "arm0",
                            "thresholds": [per-exit floats]?}
                           (new subtask; optional per-stream threshold
                            override — clients with different compute/SLA
                            budgets share one engine)
  POST /v1/step            {"stream": "arm0",
                            "instruction": "push the red block",
                            "rgb": <b64 u8>, "rgb_shape": [H, W, 3],
                            "gripper": <b64 u8>, "gripper_shape": [h, w, 3],
                            "robot_obs": [floats]?}      (proprio models)
                           -> {"action": [7] | [[k x 7]],
                               "exit_layer": int, "step_ms": float}
  POST /v1/close           {"stream": "arm0"}

The camera contract matches the CALVIN observation the rollout adapter
consumes (eval/rollout.CalvinPolicyAdapter): raw HxWx3 uint8 frames;
resize + CLIP normalization runs on device inside the jitted prefix.
Requests are serialized around the engine (one chip executes one program
at a time; for throughput-oriented multi-stream serving batch streams
into eval/batched_policy instead).
"""

from __future__ import annotations

import base64
import copy
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Dict, Optional

import numpy as np


class ServeError(ValueError):
    """Client error -> HTTP 400 with a JSON body."""


def _decode_image(payload: dict, key: str) -> np.ndarray:
    if key not in payload:
        raise ServeError(f"missing field {key!r}")
    shape = payload.get(key + "_shape")
    if not (isinstance(shape, list) and len(shape) == 3
            and all(isinstance(s, int) and s > 0 for s in shape)
            and shape[2] == 3):
        raise ServeError(f"{key}_shape must be [H, W, 3] positive "
                         f"integers, got {shape!r}")
    try:
        raw = base64.b64decode(payload[key])
    except Exception as e:
        raise ServeError(f"{key}: invalid base64 ({e})")
    n = int(np.prod(shape))
    if len(raw) != n:
        raise ServeError(f"{key}: {len(raw)} bytes != prod({shape}) = {n}")
    return np.frombuffer(raw, np.uint8).reshape(shape)


class DeerActionServer:
    """Stream registry + request execution around one shared engine.

    ``base_policy`` is any policy with the ScanDeerPolicy state contract
    (carry / cur_step / last_exit_layer + shared jitted programs): streams
    get shallow copies, so weights, stacked trees and compiled steps are
    shared and per-stream state is isolated (scan_policy.py:465-468)."""

    def __init__(self, base_policy, text_fn: Callable,
                 max_streams: int = 64, tcp_rel: bool = False):
        from deer_vla_tpu.eval.rollout import CalvinPolicyAdapter
        self._adapter_cls = CalvinPolicyAdapter
        self._base = base_policy
        self._text_fn = text_fn
        self._tcp_rel = tcp_rel
        self.max_streams = max_streams
        self._streams: Dict[str, object] = {}
        self._counts: Dict[str, int] = {}
        self._lock = threading.Lock()
        self.total_steps = 0
        self.started = time.time()

    # -- stream management --------------------------------------------------

    @staticmethod
    def _clone_policy(p):
        """Per-stream policy view: shallow copies share weights, stacked
        trees and compiled programs; wrapper policies (DiffusionSampler,
        caching wrappers) additionally get a cloned INNER policy so stream
        carries never alias.  reset() reassigns all per-stream state."""
        q = copy.copy(p)
        if hasattr(p, "policy"):
            q.policy = DeerActionServer._clone_policy(p.policy)
        q.reset()
        return q

    def _get(self, name: str):
        if not isinstance(name, str) or not name:
            raise ServeError("'stream' must be a non-empty string")
        ad = self._streams.get(name)
        if ad is None:
            if len(self._streams) >= self.max_streams:
                raise ServeError(
                    f"stream limit {self.max_streams} reached; close one")
            ad = self._adapter_cls(self._clone_policy(self._base),
                                   self._text_fn,
                                   text_len=self._base.cfg.text_len,
                                   tcp_rel=self._tcp_rel)
            self._counts[name] = 0
            self._streams[name] = ad
        return ad

    # -- endpoints ----------------------------------------------------------

    def healthz(self) -> dict:
        exits = getattr(self._base, "exits", None)
        if exits is None:  # wrapper policies (DiffusionSampler) hold the
            exits = getattr(getattr(self._base, "policy", None), "exits", [])
        with self._lock:  # POST threads mutate the stream dict
            streams = sorted(self._streams)
            steps = self.total_steps
        return {
            "ok": True,
            "exits": [int(e) for e in exits],
            "n_layers": self._base.cfg.n_layers,
            "head_type": self._base.cfg.head_type,
            "quantize": getattr(self._base, "quantize", None),
            "streams": streams,
            "steps": steps,
            "uptime_s": round(time.time() - self.started, 1),
        }

    @staticmethod
    def _engine_of(policy):
        """Unwrap to the object holding set_thresholds/exits (wrapper
        policies delegate stepping but not threshold config)."""
        p = policy
        while not hasattr(p, "set_thresholds") and hasattr(p, "policy"):
            p = p.policy
        return p

    def reset(self, payload: dict) -> dict:
        with self._lock:
            ad = self._get(payload.get("stream", ""))
            ad.reset()
            self._counts[payload["stream"]] = 0
            th = payload.get("thresholds")
            if th is not None:
                # per-stream threshold override: clients with different
                # compute/SLA budgets share the engine (each stream's
                # policy view holds its own runtime threshold array)
                eng = self._engine_of(ad.policy)
                exits = getattr(eng, "exits", [])
                if (not isinstance(th, list)
                        or len(th) != len(exits)
                        or not all(isinstance(t, (int, float)) for t in th)):
                    raise ServeError(
                        f"'thresholds' must be {len(exits)} numbers "
                        f"(exits {list(map(int, exits))})")
                eng.set_thresholds([float(t) for t in th])
        return {"ok": True}

    def close(self, payload: dict) -> dict:
        with self._lock:
            gone = self._streams.pop(payload.get("stream", ""), None)
            self._counts.pop(payload.get("stream", ""), None)
        return {"ok": True, "existed": gone is not None}

    def step(self, payload: dict) -> dict:
        instruction = payload.get("instruction")
        if not isinstance(instruction, str) or not instruction.strip():
            raise ServeError("'instruction' must be a non-empty string")
        rgb = _decode_image(payload, "rgb")
        grip = _decode_image(payload, "gripper")
        obs = {"rgb_obs": {"rgb_static": rgb, "rgb_gripper": grip}}
        if payload.get("robot_obs") is not None:
            obs["robot_obs"] = np.asarray(payload["robot_obs"], np.float32)
        with self._lock:
            name = payload.get("stream", "")
            ad = self._get(name)
            # stage reuse (steps_per_stage) keys off the per-stream step
            # counter; the rollout loop advances it via set_timestep
            # (eval_utils.py:663) — the server mirrors that per stream
            ad.policy.set_timestep(self._counts[name])
            t0 = time.perf_counter()
            action = ad.step(obs, instruction)
            self._counts[name] += 1
            self.total_steps += 1
            dt = time.perf_counter() - t0
            exit_layer = ad.current_exit_layer
        return {"action": np.asarray(action).tolist(),
                "exit_layer": int(exit_layer),
                "step_ms": round(1000 * dt, 2)}


_ROUTES = {
    "/v1/reset": "reset",
    "/v1/step": "step",
    "/v1/close": "close",
}


def make_server(core: DeerActionServer, host: str = "127.0.0.1",
                port: int = 0) -> ThreadingHTTPServer:
    """Bind a ThreadingHTTPServer to ``core``.  port=0 picks a free port
    (server.server_address[1] tells which)."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _send(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                return self._send(200, core.healthz())
            return self._send(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            name = _ROUTES.get(self.path)
            if name is None:
                return self._send(404, {"error": f"no route {self.path}"})
            try:
                n = int(self.headers.get("Content-Length", "0"))
                payload = json.loads(self.rfile.read(n) or b"{}")
                if not isinstance(payload, dict):
                    raise ServeError("body must be a JSON object")
                return self._send(200, getattr(core, name)(payload))
            except ServeError as e:
                return self._send(400, {"error": str(e)})
            except Exception as e:  # engine/internal error -> 500, keep serving
                return self._send(500, {"error": f"{type(e).__name__}: {e}"})

    return ThreadingHTTPServer((host, port), Handler)
