"""Multi-replica router: least-loaded routing, failover, recovery.

Two in-process replica servers (each its own Engine + scheduler thread,
the real multi-host topology minus the network) behind runtime/router.py
over live sockets.
"""

import http.client
import json
import threading

import jax
import pytest

from tinyllama_tpu.config import DtypePolicy, GenerationConfig, tiny_test_config
from tinyllama_tpu.io.tokenizer import Tokenizer
from tinyllama_tpu.models import llama
from tinyllama_tpu.runtime.engine import Engine
from tinyllama_tpu.runtime.router import serve_router
from tinyllama_tpu.runtime.server import serve

CFG = tiny_test_config()
F32 = DtypePolicy("f32", "f32", "f32")
TOK = "/root/reference/tokenizer.bin"
PORTS = (18941, 18942)
RPORT = 18940


@pytest.fixture(scope="module")
def cluster():
    params = llama.init_dense_params(CFG, jax.random.PRNGKey(0))
    tokenizer = Tokenizer(TOK)
    gen = GenerationConfig(greedy=True, eos_token=-1)
    backends = []
    for port in PORTS:
        engine = Engine(CFG, F32, params, max_batch=2)
        httpd = serve(engine, tokenizer, gen, port, max_batch=2)
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        backends.append(httpd)
    router = serve_router(
        [f"http://127.0.0.1:{p}" for p in PORTS], RPORT,
        probe_interval=0.2, max_failures=1,
    )
    threading.Thread(target=router.serve_forever, daemon=True).start()
    # reference engine for expected tokens
    ref = Engine(CFG, F32, params, max_batch=2)
    yield ref, tokenizer, backends, router
    router.router.close()
    router.shutdown()
    for b in backends:
        b.shutdown()


def _post(port, payload, timeout=180):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    conn.request("POST", "/generate", json.dumps(payload),
                 {"Content-Type": "application/json"})
    return conn.getresponse()


def _health(port):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("GET", "/healthz")
    return json.loads(conn.getresponse().read())


def test_routes_and_matches_engine(cluster):
    ref, tokenizer, _, _ = cluster
    prompt = "hello"
    gen = GenerationConfig(greedy=True, eos_token=-1,
                           n_predict=len(tokenizer.encode(prompt)) + 10)
    want, _ = ref.generate(tokenizer.encode(prompt), gen)
    r = _post(RPORT, {"prompt": prompt, "max_new": 10})
    assert r.status == 200
    assert json.loads(r.read())["tokens"] == want


def test_healthz_aggregates_backends(cluster):
    body = _health(RPORT)
    assert body["status"] == "ok"
    assert len(body["backends"]) == 2
    assert all(b["healthy"] for b in body["backends"])
    assert all(b["slots"] == 2 for b in body["backends"])


def test_concurrent_requests_spread_and_complete(cluster):
    ref, tokenizer, _, router = cluster
    results = {}

    def go(i, prompt):
        r = _post(RPORT, {"prompt": prompt, "max_new": 8})
        results[i] = json.loads(r.read())["tokens"]

    prompts = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    threads = [threading.Thread(target=go, args=(i, p))
               for i, p in enumerate(prompts)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    for i, p in enumerate(prompts):
        gen = GenerationConfig(greedy=True, eos_token=-1,
                               n_predict=len(tokenizer.encode(p)) + 8)
        want, _ = ref.generate(tokenizer.encode(p), gen)
        assert results[i] == want, p


def test_failover_and_recovery(cluster):
    ref, tokenizer, backends, router_httpd = cluster
    router = router_httpd.router
    # take replica 0 down: probes must mark it unhealthy
    backends[0].shutdown()
    backends[0].server_close()  # release the port for the restart below
    deadline = 20
    import time

    for _ in range(deadline * 10):
        body = _health(RPORT)
        down = [b for b in body["backends"] if not b["healthy"]]
        if down:
            break
        time.sleep(0.1)
    assert any(not b["healthy"] for b in _health(RPORT)["backends"])

    # requests keep succeeding via the surviving replica
    prompt = "after failure"
    gen = GenerationConfig(greedy=True, eos_token=-1,
                           n_predict=len(tokenizer.encode(prompt)) + 6)
    want, _ = ref.generate(tokenizer.encode(prompt), gen)
    r = _post(RPORT, {"prompt": prompt, "max_new": 6})
    assert r.status == 200
    assert json.loads(r.read())["tokens"] == want

    # restart the replica on the same port: probes re-admit it
    params = llama.init_dense_params(CFG, jax.random.PRNGKey(0))
    engine = Engine(CFG, F32, params, max_batch=2)
    httpd = serve(engine, tokenizer,
                  GenerationConfig(greedy=True, eos_token=-1),
                  PORTS[0], max_batch=2)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    backends[0] = httpd  # so the fixture can shut it down
    for _ in range(deadline * 10):
        if all(b["healthy"] for b in _health(RPORT)["backends"]):
            break
        time.sleep(0.1)
    assert all(b["healthy"] for b in _health(RPORT)["backends"])


def test_latency_weighted_pick_unit():
    """pick() minimizes expected wait (depth+1) x EWMA TTFB; backends
    without a sample score at the fleet mean (pure least-loaded)."""
    from tinyllama_tpu.runtime.router import Router

    r = Router(["http://127.0.0.1:1", "http://127.0.0.1:2"],
               probe_interval=60.0, max_failures=1)
    try:
        a, b = r.backends
        a.healthy = b.healthy = True
        r.record_latency(a, 0.1)
        r.record_latency(b, 0.4)
        assert r.pick() is a  # equal depth -> faster backend
        a.inflight = 4  # (4+1)*0.1 = 0.5 > (0+1)*0.4
        assert r.pick() is b
        r.record_latency(b, 1.2)  # EWMA folds new samples
        assert b.ewma_ttfb == pytest.approx(0.7 * 0.4 + 0.3 * 1.2)
        b.ewma_ttfb = None  # unseen backend: fleet-mean service time
        a.inflight, b.queued = 0, 1
        assert r.pick() is a
    finally:
        r.close()


def test_latency_ewma_recorded_on_proxy(cluster):
    """A proxied request leaves a TTFB sample on the serving backend."""
    r = _post(RPORT, {"prompt": "hi", "max_new": 4})
    assert r.status == 200
    r.read()
    body = _health(RPORT)
    assert any(b["ewma_ttfb_s"] for b in body["backends"])
