"""OpenAI-compatible serving API over the continuous-batching servers.

The reference ships only a single-user gradio chat (webui.py); a production
deployment needs a concurrent HTTP API. This module bridges the
EagleServer/PagedEagleServer scheduler to OpenAI's /v1/completions and
/v1/chat/completions (JSON + SSE streaming), so standard OpenAI clients
work unmodified:

- One background scheduler thread owns the server(s) and drives `step()`;
  HTTP threads only enqueue submissions/cancellations and block on
  per-request event queues — the JAX device is never touched from two
  threads.
- Requests batch continuously: concurrent clients share decode rounds
  (weight streaming amortized), joins ride admission (+ chunked prefill /
  prefix caching when the paged server has them enabled).
- Greedy-vs-sampled is a static program structure (engine.py:_pick_token),
  so temperature==0 requests route to a greedy sibling server and
  temperature>0 to a sampled one (params shared; each server has its own
  slots/KV, built lazily on first use so an unused mode costs nothing).
- `stop` sequences are enforced frontend-side on the incrementally decoded
  text; a hit cancels the request in the server (EagleServer.cancel) and
  truncates before the stop string, matching OpenAI semantics. Client
  disconnects mid-stream cancel the same way — an abandoned stream stops
  occupying a slot.
"""

from __future__ import annotations

import json
import queue
import threading
import time
import uuid
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Dict, List, Optional

import numpy as np

from .webui import TEMPLATES


@dataclass
class _Live:
    """Frontend bookkeeping for one in-flight request."""
    rid: int
    mode: bool                      # False=greedy server, True=sampled
    events: "queue.Queue" = field(default_factory=queue.Queue)
    prompt_len: int = 0
    max_tokens: int = 0
    ids: List[int] = field(default_factory=list)   # completion ids so far
    sent: int = 0                   # chars of decoded text already emitted
    stop: List[str] = field(default_factory=list)
    done: bool = False
    # incremental detokenization: text_prefix is the frozen decode of
    # ids[:t_off]; only ids[t_off:] is re-decoded per step (see
    # _emit_delta — folds are verified against a full decode, so the
    # streamed concatenation always equals decode(ids))
    text_prefix: str = ""
    t_off: int = 0


class APIFrontend:
    """Owns the scheduler thread and the per-mode servers."""

    def __init__(self, engine, encode: Callable, decode: Callable,
                 model_id: str = "eagle-tpu",
                 model_type: str = "llama3",
                 eos_token_id: Optional[int] = None,
                 paged: bool = True, **server_kw):
        """`server_kw` passes through to the server constructor
        (max_batch, page_size, async_schedule, prefill_chunk, ...)."""
        self.engine = engine
        self.encode = encode
        self.decode = decode
        self.model_id = model_id
        self.template = TEMPLATES.get(model_type, TEMPLATES["vicuna"])
        # EOS stopping happens inside the server, so the engine must carry
        # eos_token_id at construction; `eos_token_id` here only controls
        # frontend-side filtering of the EOS id from decoded text
        self.eos_token_id = (eos_token_id if eos_token_id is not None
                             else engine.eos_token_id)
        self.paged = paged
        self.server_kw = server_kw
        self._servers: Dict[bool, object] = {}   # sampled? -> server
        self._live: Dict[tuple, _Live] = {}      # (sampled?, rid) -> _Live
        self._ops: List[Callable] = []
        self._cv = threading.Condition()
        self._shutdown = False
        # serving counters (written only on the scheduler thread; HTTP
        # threads read them lock-free — ints are GIL-atomic, and metrics
        # tolerate a step of skew)
        self._t0 = time.time()
        self.counters = {
            "requests_total": 0,        # accepted submissions
            "requests_completed": 0,    # finished (eos/length/stop)
            "requests_cancelled": 0,    # client disconnect
            "requests_failed": 0,       # killed by a server failure
            "requests_rejected": 0,     # validation errors at submit
            "prompt_tokens": 0,
            "completion_tokens": 0,
            "decode_steps": 0,          # scheduler steps across servers
            "server_errors": 0,
        }
        # invariant: total == completed + cancelled + failed + in-flight
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------------
    # scheduler thread (sole owner of the servers / device)
    # ------------------------------------------------------------------

    def _server_for(self, sampled: bool):
        srv = self._servers.get(sampled)
        if srv is None:
            # construct the engine with eos_token_id — siblings inherit it
            eng = self.engine.with_sampling(sampled)
            if self.paged:
                from ..engine.paged import PagedEagleServer
                srv = PagedEagleServer(eng, **self.server_kw)
            else:
                from ..engine.server import EagleServer
                srv = EagleServer(eng, **self.server_kw)
            self._servers[sampled] = srv
        return srv

    def _loop(self):
        while True:
            with self._cv:
                while (not self._shutdown and not self._ops
                       and all(s._idle() for s in self._servers.values())):
                    self._cv.wait(0.05)
                if self._shutdown:
                    return
                ops, self._ops = self._ops, []
            for op in ops:
                op()
            for sampled, srv in list(self._servers.items()):
                if srv._idle():
                    continue
                try:
                    emitted = srv.step()
                    self.counters["decode_steps"] += 1
                    for rid, toks in emitted.items():
                        self._on_tokens(sampled, srv, rid, toks)
                    for rid in [r for (m, r) in self._live
                                if m == sampled and r in srv.finished]:
                        self._on_finished(sampled, srv, rid)
                except Exception as e:  # noqa: BLE001 — the scheduler
                    # thread must survive ANY per-server failure: if it
                    # died, every client blocked on lv.events would hang
                    # forever while /health kept reporting ok
                    self._fail_server(sampled, e)

    def _fail_server(self, sampled: bool, exc: Exception):
        """A server aborted mid-step (pool sizing error, device fault).
        Fail its live requests with an error event and drop the instance —
        a fresh server (same engine/params) is built lazily on next use;
        the broken one's pool/slot state is unrecoverable mid-flight."""
        self._servers.pop(sampled, None)
        self.counters["server_errors"] += 1
        msg = f"internal scheduler error: {exc!r}"
        for key in [k for k in self._live if k[0] == sampled]:
            self.counters["requests_failed"] += 1
            self._live.pop(key).events.put(("error", msg, 500))

    def _post(self, op: Callable):
        with self._cv:
            self._ops.append(op)
            self._cv.notify()

    # ---- token routing (scheduler thread)

    # fold the decoded prefix once the un-folded tail exceeds this many
    # tokens (or earlier at a newline boundary) — bounds per-step decode
    # work to O(tail), not O(completion length), on the scheduler thread
    _FOLD_AT_NL = 64
    _FOLD_FORCE = 512

    def _text(self, lv: _Live) -> str:
        """Decoded completion so far, re-decoding only the tail past the
        last fold point. Folding is only committed when the piecewise text
        matches a full decode exactly (tokenizers can merge text across a
        token boundary — sentencepiece leading-space rules — so an
        unverified fold could diverge from decode(ids)); the verify decode
        runs once per fold attempt, keeping total work ~O(n²/FOLD) instead
        of O(n²). Newline boundaries are preferred (HF TextStreamer's
        flush rule) because no tokenizer joins across them."""
        tail_n = len(lv.ids) - lv.t_off
        tail = self.decode(lv.ids[lv.t_off:]) if tail_n else ""
        text = lv.text_prefix + tail
        if (tail_n >= self._FOLD_FORCE
                or (tail_n >= self._FOLD_AT_NL and tail.endswith("\n"))):
            if self.decode(lv.ids) == text:
                lv.text_prefix, lv.t_off = text, len(lv.ids)
        return text

    def _emit_delta(self, lv: _Live, final: bool):
        """Incremental detokenization: decode the completion (tail-only
        past the fold point), emit the unseen suffix. A trailing U+FFFD is
        withheld until the next chunk (mid-multibyte token boundary)
        unless this is the final emit."""
        text = self._text(lv)
        for s in lv.stop:                      # stop-string enforcement
            i = text.find(s)
            if i >= 0:
                delta = text[lv.sent:i]
                lv.sent = i
                lv.done = True
                if delta:
                    lv.events.put(("delta", delta))
                lv.events.put(("done", "stop", text[:i]))
                return True
        cut = len(text)
        if not final and text.endswith("�"):
            cut -= 1
        if lv.stop and not final:
            # hold back a potential stop-string prefix at the tail so a
            # stop that lands across two chunks is never partially emitted
            holdback = max(len(s) for s in lv.stop) - 1
            cut = min(cut, len(text) - holdback)
        if cut > lv.sent:
            lv.events.put(("delta", text[lv.sent:cut]))
            lv.sent = cut
        return False

    def _on_tokens(self, sampled: bool, srv, rid: int, toks: np.ndarray):
        lv = self._live.get((sampled, rid))
        if lv is None or lv.done:
            return
        kept = [int(t) for t in toks
                if self.eos_token_id is None or t != self.eos_token_id]
        lv.ids.extend(kept)
        self.counters["completion_tokens"] += len(kept)
        if self._emit_delta(lv, final=False):
            # a stop-string hit completes the request (finish_reason
            # "stop"); the server-side cancel only frees the slot
            self.counters["requests_completed"] += 1
            if not srv.cancel(rid):
                # already finished server-side this same step (e.g. the
                # stop string arrived in the request's final chunk): the
                # finished-scan below won't visit it once it leaves _live,
                # so reap its result entries here or they leak forever
                srv.finished.pop(rid, None)
                srv.finish_reasons.pop(rid, None)
            self._live.pop((sampled, rid), None)

    def _on_finished(self, sampled: bool, srv, rid: int):
        lv = self._live.pop((sampled, rid), None)
        srv.finished.pop(rid, None)
        reason = srv.finish_reasons.pop(rid, "length")
        if lv is None or lv.done:
            return
        self.counters["requests_completed"] += 1
        self._emit_delta(lv, final=True)
        if not lv.done:
            fr = "stop" if reason == "eos" else "length"
            # piecewise text, same source as the streamed deltas — the
            # final payload must equal their concatenation exactly
            lv.events.put(("done", fr, self._text(lv)))

    # ------------------------------------------------------------------
    # HTTP-thread API
    # ------------------------------------------------------------------

    def submit(self, prompt_ids: np.ndarray, max_tokens: int,
               temperature: float, seed: int,
               stop: List[str]) -> _Live:
        """Thread-safe: enqueues the submission for the scheduler thread.
        Validation errors (e.g. a prompt the pool can never hold) surface
        as an ('error', msg) event."""
        sampled = temperature > 0
        lv = _Live(rid=-1, mode=sampled, prompt_len=len(prompt_ids),
                   max_tokens=max_tokens, stop=list(stop))
        done = threading.Event()

        def op():
            try:
                srv = self._server_for(sampled)
                lv.rid = srv.submit(
                    prompt_ids, max_new_tokens=max_tokens, seed=seed,
                    temperature=temperature if sampled else None)
                self._live[(sampled, lv.rid)] = lv
                self.counters["requests_total"] += 1
                self.counters["prompt_tokens"] += len(prompt_ids)
            except Exception as e:  # sizing/validation errors
                self.counters["requests_rejected"] += 1
                lv.events.put(("error", str(e)))
            finally:
                done.set()

        self._post(op)
        done.wait()
        return lv

    def cancel(self, lv: _Live):
        """Client went away: free the slot; if the request already
        finished server-side, reap its result entries (nobody will read
        them — same leak as the stop-in-final-step path)."""
        def op():
            if self._live.pop((lv.mode, lv.rid), None) is not None:
                self.counters["requests_cancelled"] += 1
                srv = self._servers.get(lv.mode)
                if srv is not None and not srv.cancel(lv.rid):
                    srv.finished.pop(lv.rid, None)
                    srv.finish_reasons.pop(lv.rid, None)
        self._post(op)

    def render_metrics(self) -> str:
        """Prometheus text exposition (version 0.0.4) of the serving
        counters + gauges. The vLLM-style operational surface the
        reference lacks; scrape GET /metrics."""
        c = dict(self.counters)  # snapshot (scheduler thread keeps writing)
        lines = []

        def metric(name, mtype, value, help_):
            lines.append(f"# HELP eagle_{name} {help_}")
            lines.append(f"# TYPE eagle_{name} {mtype}")
            lines.append(f"eagle_{name} {value}")

        metric("requests_total", "counter", c["requests_total"],
               "Requests accepted into the scheduler")
        metric("requests_completed_total", "counter",
               c["requests_completed"],
               "Requests finished (eos / length / stop string)")
        metric("requests_cancelled_total", "counter",
               c["requests_cancelled"],
               "Requests cancelled by client disconnect")
        metric("requests_failed_total", "counter", c["requests_failed"],
               "Requests killed by a server failure")
        metric("requests_rejected_total", "counter",
               c["requests_rejected"],
               "Submissions rejected at validation")
        metric("prompt_tokens_total", "counter", c["prompt_tokens"],
               "Prompt tokens accepted")
        metric("completion_tokens_total", "counter",
               c["completion_tokens"], "Completion tokens emitted")
        metric("decode_steps_total", "counter", c["decode_steps"],
               "Scheduler decode steps (speculative rounds) across servers")
        metric("server_errors_total", "counter", c["server_errors"],
               "Server instances dropped after a mid-step failure")
        metric("requests_in_flight", "gauge", len(self._live),
               "Requests currently scheduled")
        metric("uptime_seconds", "gauge",
               round(time.time() - self._t0, 3), "Frontend uptime")
        if c["decode_steps"]:
            metric("tokens_per_step", "gauge",
                   round(c["completion_tokens"] / c["decode_steps"], 4),
                   "Mean committed tokens per decode step (tau x batch)")
        return "\n".join(lines) + "\n"

    def shutdown(self):
        with self._cv:
            self._shutdown = True
            self._cv.notify()
        self._thread.join(timeout=5)


# ---------------------------------------------------------------------------
# OpenAI wire format
# ---------------------------------------------------------------------------

def _now() -> int:
    return int(time.time())


def _usage(lv: _Live) -> dict:
    return {"prompt_tokens": lv.prompt_len,
            "completion_tokens": len(lv.ids),
            "total_tokens": lv.prompt_len + len(lv.ids)}


class _BadRequest(ValueError):
    pass


def _parse_common(body: dict):
    max_tokens = body.get("max_tokens", body.get("max_completion_tokens"))
    if max_tokens is None:
        max_tokens = 512
    if not isinstance(max_tokens, int) or max_tokens < 1:
        raise _BadRequest("max_tokens must be a positive integer")
    temperature = body.get("temperature", 1.0)
    if temperature is None:
        temperature = 1.0
    if not isinstance(temperature, (int, float)) or temperature < 0:
        raise _BadRequest("temperature must be a number >= 0")
    if body.get("n", 1) != 1:
        raise _BadRequest("n > 1 is not supported")
    if body.get("logprobs"):
        raise _BadRequest("logprobs is not supported")
    stop = body.get("stop") or []
    if isinstance(stop, str):
        stop = [stop]
    if not (isinstance(stop, list)
            and all(isinstance(s, str) for s in stop)):
        raise _BadRequest("stop must be a string or list of strings")
    seed = body.get("seed", 0)
    if not isinstance(seed, int):
        raise _BadRequest("seed must be an integer")
    return max_tokens, float(temperature), stop, seed, bool(
        body.get("stream", False))


def make_api_handler(frontend: APIFrontend):
    fe = frontend

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):
            pass

        # ---- plumbing
        def _json(self, code: int, obj: dict):
            payload = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def _err(self, code: int, msg: str, etype: str = "invalid_request_error"):
            self._json(code, {"error": {"message": msg, "type": etype}})

        def _sse_start(self):
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.send_header("Connection", "close")
            self.end_headers()
            self.close_connection = True  # stream has no Content-Length

        def _sse(self, obj):
            data = obj if isinstance(obj, str) else json.dumps(obj)
            self.wfile.write(f"data: {data}\n\n".encode())
            self.wfile.flush()

        # ---- routes
        def do_GET(self):
            if self.path == "/v1/models":
                self._json(200, {"object": "list", "data": [
                    {"id": fe.model_id, "object": "model",
                     "created": _now(), "owned_by": "eagle-tpu"}]})
            elif self.path in ("/health", "/healthz"):
                self._json(200, {"status": "ok"})
            elif self.path == "/metrics":
                payload = fe.render_metrics().encode()
                self.send_response(200)
                self.send_header("Content-Type",
                                 "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)
            else:
                self._err(404, f"unknown path {self.path}")

        def do_POST(self):
            try:
                length = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(length) or "{}")
                if not isinstance(body, dict):
                    raise _BadRequest("body must be a JSON object")
                if self.path == "/v1/completions":
                    self._completions(body, chat=False)
                elif self.path == "/v1/chat/completions":
                    self._completions(body, chat=True)
                else:
                    self._err(404, f"unknown path {self.path}")
            except (_BadRequest, json.JSONDecodeError) as e:
                self._err(400, str(e))

        def _completions(self, body: dict, chat: bool):
            max_tokens, temperature, stop, seed, stream = \
                _parse_common(body)
            if chat:
                messages = body.get("messages")
                if not isinstance(messages, list) or not messages:
                    raise _BadRequest("messages must be a non-empty list")
                prompt = fe.template(messages)
                ids = np.asarray(fe.encode(prompt), np.int32)
            else:
                prompt = body.get("prompt")
                if isinstance(prompt, str):
                    ids = np.asarray(fe.encode(prompt), np.int32)
                elif (isinstance(prompt, list)
                        and all(isinstance(t, int) for t in prompt)):
                    ids = np.asarray(prompt, np.int32)
                else:
                    raise _BadRequest(
                        "prompt must be a string or a token-id list")
            lv = fe.submit(ids, max_tokens, temperature, seed, stop)
            oid = ("chatcmpl-" if chat else "cmpl-") + uuid.uuid4().hex[:24]
            if stream:
                self._stream_response(lv, oid, chat)
            else:
                self._block_response(lv, oid, chat)

        def _block_response(self, lv: _Live, oid: str, chat: bool):
            text, reason = "", "length"
            while True:
                kind, *rest = lv.events.get()
                if kind == "error":
                    code = rest[1] if len(rest) > 1 else 400
                    self._err(code, rest[0],
                              "internal_error" if code >= 500
                              else "invalid_request_error")
                    return
                if kind == "delta":
                    continue
                if kind == "done":
                    reason, text = rest[0], rest[1]
                    break
            choice = ({"index": 0, "message":
                       {"role": "assistant", "content": text},
                       "finish_reason": reason} if chat else
                      {"index": 0, "text": text, "finish_reason": reason})
            self._json(200, {
                "id": oid,
                "object": "chat.completion" if chat else "text_completion",
                "created": _now(), "model": fe.model_id,
                "choices": [choice], "usage": _usage(lv)})

        def _stream_response(self, lv: _Live, oid: str, chat: bool):
            obj = "chat.completion.chunk" if chat else "text_completion"

            def chunk(delta_text, reason):
                if chat:
                    delta = {} if delta_text is None else \
                        {"content": delta_text}
                    ch = {"index": 0, "delta": delta,
                          "finish_reason": reason}
                else:
                    ch = {"index": 0, "text": delta_text or "",
                          "finish_reason": reason}
                return {"id": oid, "object": obj, "created": _now(),
                        "model": fe.model_id, "choices": [ch]}

            started = False
            try:
                while True:
                    kind, *rest = lv.events.get()
                    if kind == "error":
                        if started:
                            break
                        code = rest[1] if len(rest) > 1 else 400
                        self._err(code, rest[0],
                                  "internal_error" if code >= 500
                                  else "invalid_request_error")
                        return
                    if not started:
                        self._sse_start()
                        if chat:   # OpenAI sends the role first
                            first = chunk(None, None)
                            first["choices"][0]["delta"] = {
                                "role": "assistant"}
                            self._sse(first)
                        started = True
                    if kind == "delta":
                        self._sse(chunk(rest[0], None))
                    elif kind == "done":
                        self._sse(chunk(None, rest[0]))
                        self._sse("[DONE]")
                        break
            except (BrokenPipeError, ConnectionResetError):
                fe.cancel(lv)   # abandoned stream frees its slot

    return Handler


def serve(frontend: APIFrontend, host: str = "127.0.0.1",
          port: int = 8000) -> ThreadingHTTPServer:
    srv = ThreadingHTTPServer((host, port), make_api_handler(frontend))
    print(f"EAGLE-TPU OpenAI API: http://{host}:{srv.server_address[1]}/v1")
    return srv


def main():  # pragma: no cover - requires real checkpoints
    import argparse

    from ..config import EngineConfig
    from ..engine.engine import EagleEngine
    from ..models.hf_loader import load_draft, load_target

    ap = argparse.ArgumentParser()
    ap.add_argument("--base-model-path", required=True)
    ap.add_argument("--ea-model-path", required=True)
    ap.add_argument("--model-type", default="llama3",
                    choices=list(TEMPLATES))
    ap.add_argument("--use-eagle3", action="store_true")
    ap.add_argument("--total-token", type=int, default=-1)
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--top-k", type=int, default=10)
    ap.add_argument("--max-len", type=int, default=2048)
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--page-size", type=int, default=128)
    ap.add_argument("--prefill-chunk", type=int, default=256)
    ap.add_argument("--async-schedule", type=int, default=1)
    ap.add_argument("--draft-quant", choices=["none", "int8", "int4"],
                    default="none",
                    help="weight-only draft quantization (lossless)")
    ap.add_argument("--target-quant", choices=["none", "int8", "int4"],
                    default="none",
                    help="weight-only target quantization (serving "
                         "operating point; int8 ~halves and int4 "
                         "~quarters weight HBM — what fits an 8B target "
                         "on one v5e chip)")
    ap.add_argument("--kv-quant", choices=["none", "int8"], default="none",
                    help="int8 KV-cache storage: halves decode-round KV "
                         "streaming and doubles paged-pool capacity (its "
                         "own greedy==vanilla operating point)")
    ap.add_argument("--quant-group", type=int, default=128,
                    help="int4 scale-group size along K (512 = measured "
                         "faster-but-coarser opt-in)")
    ap.add_argument("--port", type=int, default=8000)
    args = ap.parse_args()

    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(args.base_model_path)
    params, cfg = load_target(args.base_model_path)
    dparams, dcfg = load_draft(args.ea_model_path,
                               version=3 if args.use_eagle3 else 1,
                               target_embed=params["embed"]["w"])
    if args.target_quant == "int8":
        from ..ops.quant import quantize_target_params
        params = quantize_target_params(params)
    elif args.target_quant == "int4":
        from ..ops.quant4 import quantize_target_params4
        params = quantize_target_params4(params, group=args.quant_group)
    # total_token=-1 means serving-batch calibration, which happens in the
    # server (EagleServer total_tokens=-1); the engine needs a concrete tree
    ecfg = EngineConfig(
        total_tokens=60 if args.total_token == -1 else args.total_token,
        depth=args.depth, top_k=args.top_k, max_len=args.max_len,
        draft_quant=args.draft_quant, kv_quant=args.kv_quant)
    engine = EagleEngine(params, cfg, dparams, dcfg, ecfg,
                         eos_token_id=tok.eos_token_id)
    fe = APIFrontend(
        engine,
        encode=lambda s: tok(s, return_tensors="np").input_ids[0],
        decode=lambda ids: tok.decode(ids, skip_special_tokens=True),
        model_id=args.base_model_path.rstrip("/").rsplit("/", 1)[-1],
        model_type=args.model_type, max_batch=args.max_batch,
        page_size=args.page_size, prefill_chunk=args.prefill_chunk,
        async_schedule=args.async_schedule, total_tokens=args.total_token)
    serve(fe, port=args.port).serve_forever()


if __name__ == "__main__":  # pragma: no cover
    main()
