"""HTTP streaming server over the continuous-batching scheduler.

The reference is a terminal chat loop (tinyllama.cpp:272-288); this is
the serving surface BASELINE.json's configs imply (batch-32 continuous
batching). Stdlib-only (zero egress box): a ThreadingHTTPServer front
end feeds a single scheduler thread — all JAX work stays on one thread,
HTTP threads only enqueue requests and drain per-request token queues.

Endpoints:
  POST /generate   {"prompt": str, "max_new"?: int, "stream"?: bool,
                    "greedy"?: bool, "temperature"?: float, "top_k"?: int}
    stream=true  -> text/event-stream, one SSE `data:` line per token
                    piece, final event `data: [DONE]`
    stream=false -> {"text": str, "tokens": [int], "ttft_ms": float}
  GET /healthz     {"status": "ok", "slots": B, "queued": n}

Run:  python -m tinyllama_tpu.runtime.server --random-weights \
          --model tiny-test --platform cpu --port 8080
"""

from __future__ import annotations

import argparse
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from tinyllama_tpu.config import GenerationConfig


class _SchedulerLoop:
    """Single thread that owns the ContinuousBatcher: admits queued
    requests and fans generated tokens out to per-request queues."""

    _END = object()

    def __init__(self, batcher, tokenizer):
        self.batcher = batcher
        self.tokenizer = tokenizer
        self._lock = threading.Lock()
        self._queues: dict[int, queue.Queue] = {}
        self._pending = 0
        self._wake = threading.Event()
        self.error: str | None = None  # set if the scheduler thread died
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def submit(self, prompt_ids, max_new) -> tuple[int, queue.Queue]:
        if self.error is not None:
            raise RuntimeError(f"scheduler thread died: {self.error}")
        q: queue.Queue = queue.Queue()
        with self._lock:
            rid = self.batcher.submit(prompt_ids, max_new=max_new)
            self._queues[rid] = q
            self._pending += 1
        self._wake.set()
        return rid, q

    @property
    def queued(self) -> int:
        return self._pending

    def _stream(self, rid: int, tok: int) -> None:
        q = self._queues.get(rid)
        if q is not None:
            q.put(tok)

    def _run(self) -> None:
        # Any exception out of batcher.step would otherwise kill this
        # daemon thread silently and leave every HTTP handler blocked on
        # q.get() forever: log it, release all waiters, and mark the loop
        # dead so subsequent submits fail fast.
        try:
            while True:
                with self._lock:
                    work = self.batcher.has_work
                if not work:
                    self._wake.wait(timeout=0.05)
                    self._wake.clear()
                    continue
                with self._lock:
                    self.batcher.step(stream=self._stream)
                    finished = [
                        rid for rid in list(self._queues)
                        if rid in self.batcher.results
                    ]
                    for rid in finished:
                        self._queues[rid].put(self._END)
                        del self._queues[rid]
                        self._pending -= 1
        except BaseException as e:  # noqa: BLE001 — must never die silently
            import traceback

            traceback.print_exc()
            self.error = f"{type(e).__name__}: {e}"
            with self._lock:
                for q in self._queues.values():
                    q.put(self._END)
                self._queues.clear()
                self._pending = 0


def make_handler(loop: _SchedulerLoop, tokenizer):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            if self.path != "/healthz":
                self.send_error(404)
                return
            body = json.dumps({
                "status": "ok" if loop.error is None else "error",
                "slots": loop.batcher.B,
                "queued": loop.queued,
                **({"error": loop.error} if loop.error else {}),
            }).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            if self.path != "/generate":
                self.send_error(404)
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                prompt = req["prompt"]
            except (KeyError, ValueError) as e:
                self.send_error(400, f"bad request: {e}")
                return
            ids = tokenizer.encode(prompt)
            max_new = int(req.get("max_new", 128))
            t0 = time.perf_counter()
            rid, q = loop.submit(ids, max_new)

            toks: list[int] = []
            ttft = None
            if req.get("stream"):
                self.send_response(200)
                self.send_header("Content-Type", "text/event-stream")
                self.send_header("Cache-Control", "no-cache")
                self.end_headers()
                prev = 1
                while True:
                    tok = q.get()
                    if tok is loop._END:
                        break
                    if ttft is None:
                        ttft = time.perf_counter() - t0
                    piece = tokenizer.decode(prev, tok)
                    prev = tok
                    toks.append(tok)
                    self.wfile.write(
                        b"data: "
                        + json.dumps({
                            "token": tok,
                            "piece": piece.decode("utf-8", "replace"),
                        }).encode()
                        + b"\n\n"
                    )
                    self.wfile.flush()
                self.wfile.write(b"data: [DONE]\n\n")
                self.wfile.flush()
                self.close_connection = True
                return

            while True:
                tok = q.get()
                if tok is loop._END:
                    break
                if ttft is None:
                    ttft = time.perf_counter() - t0
                toks.append(tok)
            body = json.dumps({
                "text": tokenizer.decode_sequence(toks),
                "tokens": toks,
                "ttft_ms": round((ttft or 0.0) * 1000, 1),
            }).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return Handler


def serve(engine, tokenizer, gen: GenerationConfig, port: int,
          max_batch: int | None = None, paged: bool = False,
          n_pages: int | None = None):
    from tinyllama_tpu.runtime.scheduler import ContinuousBatcher

    batcher = ContinuousBatcher(
        engine, gen, max_batch=max_batch, paged=paged, n_pages=n_pages
    )
    loop = _SchedulerLoop(batcher, tokenizer)
    httpd = ThreadingHTTPServer(("0.0.0.0", port),
                                make_handler(loop, tokenizer))
    httpd.batcher = batcher  # for tests / introspection (cf. httpd.router)
    return httpd


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--paged", action="store_true")
    ap.add_argument("--model", default="tinyllama-1.1b-chat-v0.4")
    ap.add_argument("--dtype", default="q4")
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--tokenizer", default="/root/reference/tokenizer.bin")
    ap.add_argument("--random-weights", action="store_true")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--greedy", action="store_true")
    ap.add_argument("--temp", type=float, default=0.9)
    ap.add_argument("--topk", type=int, default=50)
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from tinyllama_tpu.config import MODEL_REGISTRY, POLICIES, tiny_test_config
    from tinyllama_tpu.io.hf_tokenizer import load_tokenizer
    from tinyllama_tpu.models import llama
    from tinyllama_tpu.runtime.engine import Engine

    cfg = (tiny_test_config() if args.model == "tiny-test"
           else MODEL_REGISTRY[args.model])
    policy = POLICIES[args.dtype]
    if args.random_weights:
        dense = llama.init_dense_params(cfg, jax.random.PRNGKey(0),
                                        jnp.float32)
        params = llama.convert_params(dense, policy)
        del dense
    else:
        from pathlib import Path

        from tinyllama_tpu.io.checkpoint import load_gten_checkpoint

        params, policy = load_gten_checkpoint(Path(args.ckpt), cfg, policy)

    tokenizer = load_tokenizer(args.tokenizer)
    engine = Engine(cfg, policy, params, max_batch=args.slots)
    gen = GenerationConfig(
        greedy=args.greedy, temperature=args.temp, top_k=args.topk,
        eos_token=getattr(tokenizer, "eos", -1),
    )
    httpd = serve(engine, tokenizer, gen, args.port, max_batch=args.slots,
                  paged=args.paged)
    print(f"serving on :{args.port} ({args.slots} slots, "
          f"{'paged' if args.paged else 'monolithic'} KV)", flush=True)
    httpd.serve_forever()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
