"""Chat web UI + backend — stdlib analog of the reference's gradio app
(/root/reference/eagle/application/webui.py).

Feature parity: streaming generation through the speculative engine with
draft-accepted tokens highlighted (webui.py:47-71), live Speed (tokens/s)
and Compression Ratio (tokens per target forward) boxes (webui.py:151-205),
EAGLE on/off toggle (fixed here: the reference's `--no-eagle3` flag is
passed un-negated, webui.py:253-280), and per-model chat templates
(webui.py:101-142). gradio is unavailable in this environment, so the UI is
a single-page app served by `http.server` with NDJSON streaming.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Iterator, List, Optional


# ---------------------------------------------------------------------------
# chat templates — shared with the eval harness (single source of truth;
# webui.py:101-142 analog). History dicts are converted to the harness's
# (turns, answers) form.
# ---------------------------------------------------------------------------

def _history_wrap(fn):
    def t(history: List[dict]) -> str:
        # Normalize to the harness's alternating (turns, answers) form
        # WITHOUT reordering: consecutive same-role messages merge, and an
        # assistant-seeded greeting gets an empty leading user turn.
        turns: List[str] = []
        answers: List[str] = []
        for m in history:
            c = m.get("content", "")
            role = m.get("role")
            if role == "user":
                if len(turns) > len(answers):       # consecutive user
                    turns[-1] = turns[-1] + "\n" + c
                else:
                    turns.append(c)
            elif role == "assistant":
                if len(turns) > len(answers):
                    answers.append(c)
                elif answers:                       # consecutive assistant
                    answers[-1] = answers[-1] + "\n" + c
                else:                               # assistant-seeded chat
                    turns.append("")
                    answers.append(c)
        return fn(turns, answers)
    return t


def _templates():
    from ..evaluation import harness
    return {k: _history_wrap(f) for k, f in harness.CHAT_TEMPLATES.items()}


TEMPLATES = _templates()


# ---------------------------------------------------------------------------
# backend
# ---------------------------------------------------------------------------

class ChatBackend:
    """Bridges the engine to streaming chat events."""

    def __init__(self, engine, encode: Callable, decode: Callable,
                 model_type: str = "llama3",
                 eos_token_id: Optional[int] = None):
        self.engine = engine
        self.encode = encode
        self.decode = decode
        self.template = TEMPLATES.get(model_type, TEMPLATES["vicuna"])
        self.eos_token_id = eos_token_id
        self._lock = threading.Lock()  # one generation at a time
        self._engines = {self.engine.ecfg.temperature > 0: self.engine}
        # one EagleSession per engine mode: turn N+1 prefills only the new
        # turn's tokens (multi-turn KV reuse — the reference re-prefills the
        # whole history every turn); edited histories rewind automatically
        self._sessions: dict = {}

    def _engine_for(self, temperature: Optional[float]):
        """Per-request temperature: t>0 values are traced data on the
        sampled-mode engine (no recompile between values); t=0 needs the
        structurally different greedy program. None = the engine's own
        configured mode. Siblings share all params. Check-and-create runs
        under the generation lock: under ThreadingHTTPServer two first
        requests would otherwise race to build duplicate sibling engines,
        each paying its own program compiles."""
        if temperature is None:
            return self.engine
        sampled = temperature > 0
        with self._lock:
            eng = self._engines.get(sampled)
            if eng is None:
                eng = self.engine.with_sampling(sampled)
                self._engines[sampled] = eng
        return eng

    def stream_reply(self, history: List[dict], use_eagle: bool = True,
                     max_new_tokens: int = 512,
                     temperature: Optional[float] = None) -> Iterator[dict]:
        """Yield {text, new_text, highlight, tokens_per_s,
        compression_ratio, done} events per decode round. temperature=None
        uses the engine's configured sampling mode."""
        prompt = self.template(history)
        ids = self.encode(prompt)
        engine = self._engine_for(temperature)
        t0 = time.time()
        with self._lock:
            if use_eagle:
                from ..engine.session import EagleSession

                sess = self._sessions.get(id(engine))
                if sess is None:
                    sess = EagleSession(engine)
                    self._sessions[id(engine)] = sess
                if (len(ids) + engine.path_len + 1 >= engine.ecfg.max_len):
                    yield {"error": "conversation exceeds the engine's "
                                    f"max_len ({engine.ecfg.max_len}); "
                                    "start a new chat", "done": True}
                    return
                prev = len(ids)
                for all_ids, st in sess.stream(
                        ids, max_new_tokens=max_new_tokens,
                        eos_token_id=self.eos_token_id,
                        temperature=temperature or None):
                    chunk = all_ids[prev:]
                    prev = len(all_ids)
                    dt = time.time() - t0
                    yield {
                        "new_text": self.decode(chunk),
                        "text": self.decode(all_ids[len(ids):]),
                        # tokens beyond the first in a round were
                        # draft-accepted (highlighted in the reference UI)
                        "highlight": int(st["accept_len"]),
                        "tokens_per_s": st["new_tokens"] / max(dt, 1e-6),
                        "compression_ratio": st["new_tokens"] / st["rounds"],
                        "reused_prefix": int(st["reused_prefix"]),
                        "done": False,
                    }
            else:
                prev = len(ids)
                for all_ids, st in engine.generate_vanilla_stream(
                        ids, max_new_tokens=max_new_tokens,
                        eos_token_id=self.eos_token_id,
                        temperature=temperature or None):
                    chunk = all_ids[prev:]
                    prev = len(all_ids)
                    dt = time.time() - t0
                    yield {
                        "new_text": self.decode(chunk),
                        "text": self.decode(all_ids[len(ids):]),
                        "highlight": 0,
                        "tokens_per_s": st["new_tokens"] / max(dt, 1e-6),
                        "compression_ratio": 1.0,
                        "done": False,
                    }
        yield {"done": True}


# ---------------------------------------------------------------------------
# HTTP server
# ---------------------------------------------------------------------------

PAGE = """<!doctype html><html><head><meta charset="utf-8">
<title>EAGLE-TPU chat</title><style>
body{font-family:sans-serif;max-width:760px;margin:2em auto}
#log{border:1px solid #ccc;padding:1em;min-height:200px;white-space:pre-wrap}
.stats{color:#666;font-size:0.9em;margin:0.5em 0}
.hl{background:#cdf}
</style></head><body>
<h3>EAGLE-TPU chat</h3>
<div class="stats">Speed: <span id="tps">-</span> tok/s &nbsp;
Compression ratio: <span id="cr">-</span>
&nbsp; <label><input type="checkbox" id="eagle" checked>EAGLE</label></div>
<div id="log"></div>
<p><input id="msg" size="70"><button onclick="send()">Send</button></p>
<script>
let history=[];
async function send(){
  const m=document.getElementById('msg').value;
  history.push({role:'user',content:m});
  document.getElementById('log').textContent+='\\nUSER: '+m+'\\nASSISTANT: ';
  const r=await fetch('/chat',{method:'POST',body:JSON.stringify(
    {history:history,use_eagle:document.getElementById('eagle').checked})});
  const reader=r.body.getReader();const dec=new TextDecoder();let buf='';let full='';
  while(true){const{value,done}=await reader.read();if(done)break;
    buf+=dec.decode(value,{stream:true});
    let i;while((i=buf.indexOf('\\n'))>=0){
      const line=buf.slice(0,i);buf=buf.slice(i+1);if(!line)continue;
      const ev=JSON.parse(line);
      if(ev.done){history.push({role:'assistant',content:full});return;}
      full=ev.text;
      document.getElementById('tps').textContent=ev.tokens_per_s.toFixed(1);
      document.getElementById('cr').textContent=ev.compression_ratio.toFixed(2);
      const log=document.getElementById('log');
      log.textContent=log.textContent.replace(/ASSISTANT: [^]*$/,'ASSISTANT: ')+full;
    }}
}
</script></body></html>"""


def make_handler(backend: ChatBackend):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.end_headers()
            self.wfile.write(PAGE.encode())

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            try:
                req = json.loads(self.rfile.read(length) or "{}")
                if not isinstance(req, dict):
                    raise ValueError("body must be a JSON object")
            except (ValueError, json.JSONDecodeError) as e:
                self.send_response(400)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(json.dumps({"error": str(e)}).encode())
                return
            self.send_response(200)
            self.send_header("Content-Type", "application/x-ndjson")
            self.end_headers()
            for ev in backend.stream_reply(
                    req.get("history", []),
                    use_eagle=req.get("use_eagle", True),
                    max_new_tokens=req.get("max_new_tokens", 512),
                    temperature=req.get("temperature")):
                self.wfile.write((json.dumps(ev) + "\n").encode())
                self.wfile.flush()

    return Handler


def serve(backend: ChatBackend, host: str = "127.0.0.1", port: int = 7860):
    srv = ThreadingHTTPServer((host, port), make_handler(backend))
    print(f"EAGLE-TPU chat UI: http://{host}:{srv.server_address[1]}")
    srv.serve_forever()


def main():  # pragma: no cover - requires real checkpoints
    import argparse

    import jax.numpy as jnp

    from ..config import EngineConfig
    from ..engine.engine import EagleEngine
    from ..models.hf_loader import load_draft, load_target

    ap = argparse.ArgumentParser()
    ap.add_argument("--base-model-path", required=True)
    ap.add_argument("--ea-model-path", required=True)
    ap.add_argument("--model-type", default="llama3",
                    choices=list(TEMPLATES))
    ap.add_argument("--use-eagle3", action="store_true")
    ap.add_argument("--total-token", type=int, default=60)
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--top-k", type=int, default=10)
    ap.add_argument("--max-len", type=int, default=2048)
    ap.add_argument("--draft-quant", choices=["none", "int8", "int4"],
                    default="none")
    ap.add_argument("--target-quant", choices=["none", "int8", "int4"],
                    default="none")
    ap.add_argument("--kv-quant", choices=["none", "int8"], default="none")
    ap.add_argument("--port", type=int, default=7860)
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
        params = quantize_target_params4(params)
    ecfg = EngineConfig(total_tokens=args.total_token, depth=args.depth,
                        top_k=args.top_k, max_len=args.max_len,
                        draft_quant=args.draft_quant,
                        kv_quant=args.kv_quant)
    engine = EagleEngine(params, cfg, dparams, dcfg, ecfg)
    backend = ChatBackend(
        engine,
        encode=lambda s: tok(s, return_tensors="np").input_ids[0],
        decode=lambda ids: tok.decode(ids, skip_special_tokens=True),
        model_type=args.model_type, eos_token_id=tok.eos_token_id)
    serve(backend, port=args.port)


if __name__ == "__main__":  # pragma: no cover
    main()
