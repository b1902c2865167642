"""OpenAI-compatible API server: completions + chat over HTTP against the
continuous-batching paged server — non-stream, SSE streaming, stop
sequences, temperature routing (greedy vs sampled sibling servers),
concurrent clients sharing a batch, and error handling."""

import json
import threading
import urllib.error
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from eagle_tpu.application.api_server import APIFrontend, make_api_handler
from eagle_tpu.engine.engine import EagleEngine

from test_engine_greedy import make_engine


def _encode(s):
    return np.frombuffer(s.encode()[-40:], dtype=np.uint8).astype(
        np.int32) % 128


def _decode(ids):
    return bytes(int(i) % 128 for i in ids).decode(errors="replace")


def _mk_frontend(eos=None, **kw):
    eng0 = make_engine(1)
    eng = EagleEngine(eng0.params, eng0.cfg, eng0.dparams, eng0.dcfg,
                      eng0.ecfg, eos_token_id=eos)
    kw.setdefault("max_batch", 2)
    kw.setdefault("page_size", 16)
    fe = APIFrontend(eng, _encode, _decode, model_type="vicuna", **kw)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_api_handler(fe))
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return eng, fe, srv, srv.server_address[1]


def _post(port, path, body, timeout=180):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(body).encode(), method="POST",
        headers={"Content-Type": "application/json"})
    return urllib.request.urlopen(req, timeout=timeout)


def _teardown(fe, srv):
    srv.shutdown()
    fe.shutdown()


def test_completions_greedy_matches_engine():
    """Non-stream completion at temperature 0 returns exactly the greedy
    engine's decode of the same prompt ids."""
    eng, fe, srv, port = _mk_frontend()
    try:
        prompt = "abcd"
        ids = _encode(prompt)
        ref = eng.generate(ids, max_new_tokens=12)
        exp = _decode(ref[len(ids):])
        r = _post(port, "/v1/completions",
                  {"prompt": prompt, "max_tokens": 12, "temperature": 0})
        obj = json.loads(r.read())
        assert obj["object"] == "text_completion"
        assert obj["choices"][0]["text"] == exp
        assert obj["choices"][0]["finish_reason"] == "length"
        assert obj["usage"]["prompt_tokens"] == len(ids)
        assert obj["usage"]["completion_tokens"] == 12
    finally:
        _teardown(fe, srv)


def test_completions_token_id_prompt_and_models():
    eng, fe, srv, port = _mk_frontend()
    try:
        ids = [5, 17, 92, 3]
        ref = eng.generate(np.asarray(ids, np.int32), max_new_tokens=8)
        r = _post(port, "/v1/completions",
                  {"prompt": ids, "max_tokens": 8, "temperature": 0})
        obj = json.loads(r.read())
        assert obj["choices"][0]["text"] == _decode(ref[4:])
        models = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/v1/models", timeout=30).read())
        assert models["data"][0]["id"] == "eagle-tpu"
    finally:
        _teardown(fe, srv)


def test_chat_stream_sse():
    """Streamed chat completion: role-first chunk, content deltas whose
    concatenation equals the non-stream result, final finish_reason, then
    [DONE]."""
    eng, fe, srv, port = _mk_frontend()
    try:
        body = {"messages": [{"role": "user", "content": "hello"}],
                "max_tokens": 10, "temperature": 0, "stream": True}
        chunks = []
        with _post(port, "/v1/chat/completions", body) as r:
            assert r.headers["Content-Type"].startswith("text/event-stream")
            for line in r:
                line = line.decode().strip()
                if line.startswith("data: "):
                    chunks.append(line[6:])
        assert chunks[-1] == "[DONE]"
        evs = [json.loads(c) for c in chunks[:-1]]
        assert evs[0]["choices"][0]["delta"] == {"role": "assistant"}
        text = "".join(e["choices"][0]["delta"].get("content", "")
                       for e in evs)
        assert evs[-1]["choices"][0]["finish_reason"] == "length"

        ref = json.loads(_post(port, "/v1/chat/completions", {
            "messages": [{"role": "user", "content": "hello"}],
            "max_tokens": 10, "temperature": 0}).read())
        assert text == ref["choices"][0]["message"]["content"]
    finally:
        _teardown(fe, srv)


def test_stop_sequence_truncates_and_frees_slot():
    """A stop string cuts the text before its first occurrence (even when
    it spans chunk boundaries) and cancels the request server-side."""
    eng, fe, srv, port = _mk_frontend()
    try:
        prompt = "abcd"
        ids = _encode(prompt)
        ref = eng.generate(ids, max_new_tokens=24)
        full = _decode(ref[len(ids):])
        stop = full[5:8]  # a substring that WILL be generated
        r = _post(port, "/v1/completions",
                  {"prompt": prompt, "max_tokens": 24, "temperature": 0,
                   "stop": stop})
        obj = json.loads(r.read())
        got = obj["choices"][0]["text"]
        assert stop not in got
        assert got == full[:full.find(stop)]
        assert obj["choices"][0]["finish_reason"] == "stop"
        # the cancelled request released its slot: server fully idle
        sampled_srv = fe._servers[False]
        assert sampled_srv._idle()
    finally:
        _teardown(fe, srv)


def test_eos_maps_to_stop_finish_reason():
    eng0 = make_engine(1)
    p = _encode("abcd")
    ref = eng0.generate_vanilla(p, max_new_tokens=30)
    eos = int(ref[len(p) + 6])
    eng, fe, srv, port = _mk_frontend(eos=eos)
    try:
        r = _post(port, "/v1/completions",
                  {"prompt": "abcd", "max_tokens": 30, "temperature": 0})
        obj = json.loads(r.read())
        assert obj["choices"][0]["finish_reason"] == "stop"
        exp = eng0.generate_vanilla(p, max_new_tokens=30, eos_token_id=eos)
        # EOS id itself is filtered from the decoded text
        assert obj["choices"][0]["text"] == _decode(exp[len(p):-1])
    finally:
        _teardown(fe, srv)


def test_concurrent_clients_share_batch():
    """Two clients in flight at once, greedy: both outputs bit-exact vs
    single-request generation (continuous batching under the API)."""
    eng, fe, srv, port = _mk_frontend()
    try:
        prompts = ["abcd", "wxyz"]
        refs = []
        for pr in prompts:
            ids = _encode(pr)
            out = eng.generate(ids, max_new_tokens=14)
            refs.append(_decode(out[len(ids):]))
        results = {}

        def go(i):
            r = _post(port, "/v1/completions",
                      {"prompt": prompts[i], "max_tokens": 14,
                       "temperature": 0})
            results[i] = json.loads(r.read())["choices"][0]["text"]

        ts = [threading.Thread(target=go, args=(i,)) for i in range(2)]
        [t.start() for t in ts]
        [t.join(timeout=300) for t in ts]
        assert results[0] == refs[0] and results[1] == refs[1]
    finally:
        _teardown(fe, srv)


def test_temperature_routes_to_sampled_server():
    """temperature>0 lazily builds the sampled sibling server; output is a
    valid completion and both servers coexist."""
    eng, fe, srv, port = _mk_frontend()
    try:
        r = _post(port, "/v1/completions",
                  {"prompt": "abcd", "max_tokens": 6, "temperature": 0.7,
                   "seed": 3})
        obj = json.loads(r.read())
        assert len(obj["choices"][0]["text"]) > 0
        assert obj["usage"]["completion_tokens"] == 6
        assert set(fe._servers) == {True}
        # same seed + temperature reproduces (deterministic PRNG stream)
        r2 = _post(port, "/v1/completions",
                   {"prompt": "abcd", "max_tokens": 6, "temperature": 0.7,
                    "seed": 3})
        assert json.loads(r2.read())["choices"][0]["text"] == \
            obj["choices"][0]["text"]
    finally:
        _teardown(fe, srv)


def test_bad_requests_get_400():
    eng, fe, srv, port = _mk_frontend()
    try:
        for body, path in [
            ({"prompt": 5}, "/v1/completions"),
            ({"messages": []}, "/v1/chat/completions"),
            ({"prompt": "x", "n": 2}, "/v1/completions"),
            ({"prompt": "x", "max_tokens": 0}, "/v1/completions"),
            ({"prompt": "x", "temperature": -1}, "/v1/completions"),
            ({"prompt": "x", "stop": 5}, "/v1/completions"),
        ]:
            with pytest.raises(urllib.error.HTTPError) as ei:
                _post(port, path, body)
            assert ei.value.code == 400
    finally:
        _teardown(fe, srv)


def test_metrics_endpoint():
    """GET /metrics serves Prometheus text with counters that reflect the
    traffic actually served."""
    eng, fe, srv, port = _mk_frontend()
    try:
        r = json.loads(_post(port, "/v1/completions",
                             {"prompt": "abcd", "max_tokens": 6}).read())
        assert r["usage"]["completion_tokens"] > 0
        body = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/metrics", timeout=60)
        assert body.headers["Content-Type"].startswith("text/plain")
        text = body.read().decode()
        m = {}
        for line in text.splitlines():
            if line and not line.startswith("#"):
                k, v = line.split()
                m[k] = float(v)
        assert m["eagle_requests_total"] == 1
        assert m["eagle_requests_completed_total"] == 1
        assert m["eagle_requests_in_flight"] == 0
        assert m["eagle_prompt_tokens_total"] == 4
        assert m["eagle_completion_tokens_total"] >= 6
        assert m["eagle_decode_steps_total"] >= 1
        assert m["eagle_tokens_per_step"] > 0
        assert m["eagle_uptime_seconds"] > 0
    finally:
        _teardown(fe, srv)
