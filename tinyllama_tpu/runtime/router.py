"""Multi-host serving: request routing across data-parallel replicas.

SURVEY.md §5's distributed-serving row and the round-2 review's last
open capability: the (dcn, data, model) mesh scales one *model* across
chips, while serving throughput scales across HOSTS as independent
data-parallel replicas — each host runs its own `runtime.server`
(Engine + ContinuousBatcher, optionally TP over its local chips), and
this router is the front end that spreads requests over them.

The reference has no counterpart (single-process chat loop,
/root/reference/tinyllama.cpp:272-288). Stdlib-only, like the server.

Design:

* **Latency-weighted least-loaded routing.** Every backend's `/healthz`
  is polled by a probe thread (`probe_interval`); its `queued` count
  plus the router's own in-flight counter is the queue depth. Each
  backend also carries an EWMA of its measured time-to-first-byte, so
  the routing score is the *expected wait* `(depth + 1) x ewma_ttfb` —
  join-shortest-queue that also sees heterogeneous replicas (a host
  with slower chips, a cold jit cache, a busy NIC) without any backend
  cooperation. Until a backend has served a request its service time
  is taken as the fleet mean (everyone equal -> pure least-loaded).
* **Failure detection.** A probe or proxy error marks the backend
  suspect; `max_failures` consecutive errors take it out of rotation.
  Probing continues (the same thread), so a restarted host rejoins
  automatically after one clean probe — the restart-reload story
  SURVEY §5 asks for (the host's server reloads weights on boot, the
  router only needs its `/healthz` to go green again).
* **Request-level failover.** A request that dies on a backend
  mid-proxy (connection refused/reset before any byte was forwarded)
  is retried on the next-least-loaded healthy backend, up to one
  attempt per backend. Once streaming bytes have been forwarded the
  error is surfaced to the client instead (re-running a sampled
  request would silently return different tokens).

Endpoints mirror the single-host server (`POST /generate` incl. SSE
streaming, `GET /healthz` aggregating per-backend status), so a client
cannot tell the router from a lone server.

Run:  python -m tinyllama_tpu.runtime.router \
          --backends http://host-a:8080,http://host-b:8080 --port 8000
"""

from __future__ import annotations

import argparse
import json
import threading
import time
import urllib.error
import urllib.request
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


@dataclass
class Backend:
    url: str  # e.g. "http://host:8080", no trailing slash
    healthy: bool = False
    consecutive_failures: int = 0
    queued: int = 0  # from the last /healthz probe
    slots: int = 0
    inflight: int = 0  # requests this router is holding open
    ewma_ttfb: float | None = None  # measured service latency, seconds
    lock: threading.Lock = field(default_factory=threading.Lock)

    @property
    def load(self) -> int:
        return self.queued + self.inflight


class Router:
    """Health-checked least-loaded proxy over replica servers."""

    def __init__(
        self,
        backend_urls: list[str],
        probe_interval: float = 2.0,
        max_failures: int = 2,
        timeout: float = 300.0,
        latency_alpha: float = 0.3,
    ):
        self.latency_alpha = latency_alpha
        assert backend_urls, "router needs at least one backend"
        self.backends = [Backend(u.rstrip("/")) for u in backend_urls]
        self.probe_interval = probe_interval
        self.max_failures = max_failures
        self.timeout = timeout
        self._stop = threading.Event()
        self._probe_thread = threading.Thread(
            target=self._probe_loop, daemon=True
        )
        self.probe_all()  # synchronous first pass: start with real state
        self._probe_thread.start()

    # ------------------------------------------------------------- probing

    def probe_all(self) -> None:
        for b in self.backends:
            self._probe(b)

    def _probe(self, b: Backend) -> None:
        try:
            with urllib.request.urlopen(
                b.url + "/healthz", timeout=5.0
            ) as r:
                info = json.loads(r.read())
            ok = info.get("status") == "ok"
        except (OSError, ValueError, urllib.error.URLError):
            ok = False
            info = {}
        with b.lock:
            if ok:
                b.healthy = True
                b.consecutive_failures = 0
                b.queued = int(info.get("queued", 0))
                b.slots = int(info.get("slots", 0))
            else:
                b.consecutive_failures += 1
                if b.consecutive_failures >= self.max_failures:
                    b.healthy = False

    def _probe_loop(self) -> None:
        while not self._stop.wait(self.probe_interval):
            self.probe_all()

    def close(self) -> None:
        self._stop.set()

    # ------------------------------------------------------------- routing

    def mark_failure(self, b: Backend) -> None:
        with b.lock:
            b.consecutive_failures += 1
            if b.consecutive_failures >= self.max_failures:
                b.healthy = False

    def record_latency(self, b: Backend, seconds: float) -> None:
        """Fold one measured time-to-first-byte into the backend's EWMA
        service time (do_POST calls this on every successful proxy)."""
        a = self.latency_alpha
        with b.lock:
            b.ewma_ttfb = (
                seconds if b.ewma_ttfb is None
                else (1 - a) * b.ewma_ttfb + a * seconds
            )

    def pick(self, exclude: set[str] = frozenset()) -> Backend | None:
        """Healthy backend (not in `exclude`) with the lowest expected
        wait: (queue depth + 1) x EWMA service time. Backends with no
        latency sample yet score with the fleet mean, so a fresh/just-
        recovered replica is neither shunned nor flooded."""
        live = [
            b for b in self.backends
            if b.healthy and b.url not in exclude
        ]
        if not live:
            return None
        known = [b.ewma_ttfb for b in live if b.ewma_ttfb is not None]
        default = sum(known) / len(known) if known else 1.0
        return min(
            live,
            key=lambda b: (b.load + 1) * (
                b.ewma_ttfb if b.ewma_ttfb is not None else default
            ),
        )

    def health(self) -> dict:
        per = [
            {
                "url": b.url, "healthy": b.healthy, "queued": b.queued,
                "slots": b.slots, "inflight": b.inflight,
                "ewma_ttfb_s": b.ewma_ttfb,
            }
            for b in self.backends
        ]
        return {
            "status": "ok" if any(b.healthy for b in self.backends)
            else "error",
            "backends": per,
        }


def make_handler(router: Router):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            if self.path != "/healthz":
                self.send_error(404)
                return
            body = json.dumps(router.health()).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            if self.path != "/generate":
                self.send_error(404)
                return
            n = int(self.headers.get("Content-Length", 0))
            payload = self.rfile.read(n)

            tried: set[str] = set()
            while True:
                b = router.pick(exclude=tried)
                if b is None:
                    self.send_error(503, "no healthy backend")
                    return
                tried.add(b.url)
                with b.lock:
                    b.inflight += 1
                started = False
                t0 = time.monotonic()
                try:
                    req = urllib.request.Request(
                        b.url + "/generate", data=payload,
                        headers={"Content-Type": "application/json"},
                    )
                    with urllib.request.urlopen(
                        req, timeout=router.timeout
                    ) as r:
                        ctype = r.headers.get(
                            "Content-Type", "application/json"
                        )
                        self.send_response(r.status)
                        self.send_header("Content-Type", ctype)
                        if not ctype.startswith("text/event-stream"):
                            body = r.read()  # non-streaming: first byte
                            # arrives with the finished generation
                            router.record_latency(b, time.monotonic() - t0)
                            self.send_header(
                                "Content-Length", str(len(body))
                            )
                            self.end_headers()
                            started = True
                            self.wfile.write(body)
                        else:
                            self.end_headers()
                            started = True
                            first = True
                            while True:
                                chunk = r.read(1024)
                                if first and chunk:
                                    # streaming: TTFT is the service
                                    # signal (full latency ~ n tokens)
                                    router.record_latency(
                                        b, time.monotonic() - t0
                                    )
                                    first = False
                                if not chunk:
                                    break
                                self.wfile.write(chunk)
                                self.wfile.flush()
                            self.close_connection = True
                    return
                except (OSError, urllib.error.URLError) as e:
                    router.mark_failure(b)
                    if started:
                        # bytes already left for the client: re-running
                        # could return different tokens — surface it
                        self.close_connection = True
                        return
                    if len(tried) >= len(router.backends):
                        self.send_error(
                            502, f"all backends failed (last: {e})"
                        )
                        return
                    # else: fail over to the next backend
                finally:
                    with b.lock:
                        b.inflight -= 1

    return Handler


def serve_router(backend_urls: list[str], port: int, **kw):
    router = Router(backend_urls, **kw)
    httpd = ThreadingHTTPServer(("0.0.0.0", port), make_handler(router))
    httpd.router = router  # for tests / shutdown
    return httpd


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--backends", required=True,
                    help="comma-separated replica base URLs")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--probe-interval", type=float, default=2.0)
    args = ap.parse_args(argv)
    httpd = serve_router(
        [u for u in args.backends.split(",") if u],
        args.port, probe_interval=args.probe_interval,
    )
    n = len(httpd.router.backends)
    print(f"routing on :{args.port} over {n} backends", flush=True)
    httpd.serve_forever()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
