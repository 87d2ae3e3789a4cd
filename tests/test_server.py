"""HTTP serving surface: streaming + batch correctness over live sockets."""

import http.client
import json
import threading

import jax
import pytest

from tinyllama_tpu.config import DtypePolicy, GenerationConfig, tiny_test_config
from tinyllama_tpu.io.tokenizer import Tokenizer
from tinyllama_tpu.models import llama
from tinyllama_tpu.runtime.engine import Engine
from tinyllama_tpu.runtime.server import serve

CFG = tiny_test_config()
F32 = DtypePolicy("f32", "f32", "f32")
TOK = "/root/reference/tokenizer.bin"
PORT = 18931


@pytest.fixture(scope="module")
def server():
    params = llama.init_dense_params(CFG, jax.random.PRNGKey(0))
    engine = Engine(CFG, F32, params, max_batch=2)
    tokenizer = Tokenizer(TOK)
    gen = GenerationConfig(greedy=True, eos_token=-1)
    httpd = serve(engine, tokenizer, gen, PORT, max_batch=2)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield engine, tokenizer
    httpd.shutdown()


def _post(path, payload):
    conn = http.client.HTTPConnection("127.0.0.1", PORT, timeout=120)
    conn.request("POST", path, json.dumps(payload),
                 {"Content-Type": "application/json"})
    return conn.getresponse()


def test_healthz(server):
    conn = http.client.HTTPConnection("127.0.0.1", PORT, timeout=30)
    conn.request("GET", "/healthz")
    r = conn.getresponse()
    assert r.status == 200
    body = json.loads(r.read())
    assert body["status"] == "ok" and body["slots"] == 2


def test_generate_matches_engine(server):
    engine, tokenizer = server
    prompt = "hello"
    gen = GenerationConfig(greedy=True, eos_token=-1,
                           n_predict=len(tokenizer.encode(prompt)) + 12)
    want, _ = engine.generate(tokenizer.encode(prompt), gen)
    r = _post("/generate", {"prompt": prompt, "max_new": 12})
    assert r.status == 200
    body = json.loads(r.read())
    assert body["tokens"] == want
    assert body["ttft_ms"] >= 0


def test_generate_streaming(server):
    engine, tokenizer = server
    r = _post("/generate", {"prompt": "hi", "max_new": 8, "stream": True})
    assert r.status == 200
    assert r.getheader("Content-Type").startswith("text/event-stream")
    toks = []
    buf = b""
    while True:
        chunk = r.read(1)
        if not chunk:
            break
        buf += chunk
        while b"\n\n" in buf:
            event, buf = buf.split(b"\n\n", 1)
            assert event.startswith(b"data: ")
            payload = event[len(b"data: "):]
            if payload == b"[DONE]":
                want, _ = engine.generate(
                    tokenizer.encode("hi"),
                    GenerationConfig(
                        greedy=True, eos_token=-1,
                        n_predict=len(tokenizer.encode("hi")) + 8),
                )
                assert toks == want
                return
            toks.append(json.loads(payload)["token"])
    raise AssertionError("stream ended without [DONE]")


def test_concurrent_requests(server):
    engine, tokenizer = server
    results = {}

    def go(i, prompt):
        r = _post("/generate", {"prompt": prompt, "max_new": 10})
        results[i] = json.loads(r.read())["tokens"]

    prompts = ["alpha", "beta code", "gamma ray", "delta"]
    threads = [threading.Thread(target=go, args=(i, p))
               for i, p in enumerate(prompts)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    for i, p in enumerate(prompts):
        gen = GenerationConfig(greedy=True, eos_token=-1,
                               n_predict=len(tokenizer.encode(p)) + 10)
        want, _ = engine.generate(tokenizer.encode(p), gen)
        assert results[i] == want, p
