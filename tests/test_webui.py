"""Web UI backend test: serve over HTTP, stream a chat reply via the real
engine, check NDJSON event fields (speed, compression ratio, highlights)."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np

from eagle_tpu.application import webui

from test_engine_greedy import make_engine


def _encode(s):
    return np.frombuffer(s.encode()[-40:], dtype=np.uint8).astype(np.int32) % 128


def _decode(ids):
    return bytes(int(i) % 128 for i in ids).decode(errors="replace")


def test_templates():
    hist = [{"role": "user", "content": "hi"},
            {"role": "assistant", "content": "hello"},
            {"role": "user", "content": "bye"}]
    for name, fn in webui.TEMPLATES.items():
        s = fn(hist)
        assert "hi" in s and "hello" in s and "bye" in s, name


def test_http_stream_chat():
    eng = make_engine(1)
    backend = webui.ChatBackend(eng, _encode, _decode, model_type="vicuna")
    srv = ThreadingHTTPServer(("127.0.0.1", 0), webui.make_handler(backend))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    port = srv.server_address[1]
    try:
        # page loads
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=30).read().decode()
        assert "EAGLE-TPU chat" in page

        body = json.dumps({
            "history": [{"role": "user", "content": "abc"}],
            "use_eagle": True, "max_new_tokens": 12,
        }).encode()
        req = urllib.request.Request(f"http://127.0.0.1:{port}/chat",
                                     data=body, method="POST")
        events = []
        with urllib.request.urlopen(req, timeout=120) as r:
            for line in r:
                if line.strip():
                    events.append(json.loads(line))
        assert events[-1]["done"] is True
        assert len(events) >= 2
        ev = events[-2]
        assert ev["tokens_per_s"] > 0
        assert ev["compression_ratio"] >= 1.0
        assert isinstance(ev["text"], str)

        # baseline path
        body = json.dumps({
            "history": [{"role": "user", "content": "abc"}],
            "use_eagle": False, "max_new_tokens": 8,
        }).encode()
        req = urllib.request.Request(f"http://127.0.0.1:{port}/chat",
                                     data=body, method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            events = [json.loads(l) for l in r if l.strip()]
        assert events[-1]["done"] is True
        assert events[0]["compression_ratio"] == 1.0
    finally:
        srv.shutdown()


def test_omitted_temperature_keeps_engine_mode():
    """A request without a temperature field must use the engine's own
    configured sampling mode — not silently force greedy (r2 review fix)."""
    from test_engine_greedy import make_engine as mk

    eng = mk(3, temperature=1.0)
    backend = webui.ChatBackend(eng, _encode, _decode, model_type="vicuna")
    assert backend._engine_for(None) is eng          # sampled stays sampled
    assert backend._engine_for(0.0).ecfg.temperature == 0.0
    greedy = mk(3)
    b2 = webui.ChatBackend(greedy, _encode, _decode, model_type="vicuna")
    assert b2._engine_for(None) is greedy
    assert b2._engine_for(0.7).ecfg.temperature > 0


def test_multiturn_session_reuse_bit_exact():
    """Turn 2 of a chat reuses the turn-1 KV (reused_prefix > 0) and the
    reply is bit-identical to a from-scratch generation over the same
    templated history (greedy invariant through the session path)."""
    enc = lambda s: np.frombuffer(s.encode(), np.uint8).astype(np.int32) % 128
    eng = make_engine(1)
    backend = webui.ChatBackend(eng, enc, _decode, model_type="vicuna")
    hist = [{"role": "user", "content": "abc"}]
    evs1 = [e for e in backend.stream_reply(hist, max_new_tokens=10)
            if not e.get("done")]
    assert evs1[0]["reused_prefix"] == 0
    hist += [{"role": "assistant", "content": evs1[-1]["text"]},
             {"role": "user", "content": "de"}]
    evs2 = [e for e in backend.stream_reply(hist, max_new_tokens=10)
            if not e.get("done")]
    assert evs2[0]["reused_prefix"] > 0  # turn-1 KV reused
    ids2 = enc(backend.template(hist))
    ref = eng.generate(ids2, max_new_tokens=10)
    assert evs2[-1]["text"] == _decode(ref[len(ids2):])


def test_templates_preserve_history_order():
    """Non-alternating histories must render in conversation order:
    assistant-seeded greetings come before the first user turn, and
    consecutive same-role messages merge rather than scramble."""
    hist = [{"role": "assistant", "content": "GREETING"},
            {"role": "user", "content": "FIRSTUSER"}]
    for name, fn in webui.TEMPLATES.items():
        s = fn(hist)
        assert s.index("GREETING") < s.index("FIRSTUSER"), (name, s)
    hist2 = [{"role": "user", "content": "AAA"},
             {"role": "user", "content": "BBB"},
             {"role": "assistant", "content": "CCC"}]
    for name, fn in webui.TEMPLATES.items():
        s = fn(hist2)
        assert s.index("AAA") < s.index("BBB") < s.index("CCC"), (name, s)
