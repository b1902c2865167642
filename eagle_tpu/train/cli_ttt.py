"""EAGLE-3 TTT training CLI — the traineagle3/main.py analog.

Usage (single host; multi-host via the same command on every worker after
`eagle_tpu.parallel.distributed.initialize`):

    python -m eagle_tpu.train.cli_ttt \
        --basepath /path/to/target-model \
        --configpath /path/to/draft_config.json \
        --datapath /path/to/sharegpt.jsonl \
        --cpdir ./ckpts --epochs 10 --bs 8 --max-len 2048

Replaces the DeepSpeed launcher + ZeRO-2 stack with mesh data-parallel
(gradients psum-ed by XLA) and orbax checkpointing with newest-state
auto-resume (traineagle3/main.py:244-262 semantics).
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--basepath", required=True,
                    help="target model checkpoint dir (HF format)")
    ap.add_argument("--configpath", required=True,
                    help="draft EConfig json")
    ap.add_argument("--datapath", required=True,
                    help="sharegpt-style json/jsonl")
    ap.add_argument("--cpdir", default="./eagle_tpu_ckpts")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--max-len", type=int, default=2048)
    ap.add_argument("--lr", type=float, default=5e-5)
    ap.add_argument("--ttt-length", type=int, default=7)
    ap.add_argument("--warmup-steps", type=int, default=2000)
    ap.add_argument("--total-steps", type=int, default=800000)
    ap.add_argument("--grad-clip", type=float, default=0.5)
    ap.add_argument("--save-every-epochs", type=int, default=1)
    ap.add_argument("--export-safetensors", default=None,
                    help="also export the draft in HF cnets naming")
    ap.add_argument("--metrics-file", default=None,
                    help="append per-step metrics as jsonl (wandb-equivalent "
                         "observability, train/main.py:67-70 analog)")
    ap.add_argument("--data-parallel", type=int, default=0,
                    help="mesh data axis (0 = all devices)")
    args = ap.parse_args(argv)

    from transformers import AutoTokenizer

    from ..config import DraftConfig
    from ..models import draft as draft_mod
    from ..models.hf_loader import load_target
    from ..parallel import sharding as shd
    from . import checkpoint as ckpt
    from . import data as data_mod
    from . import ttt

    print(f"[train] loading target from {args.basepath}", flush=True)
    params, cfg = load_target(args.basepath)
    tokenizer = AutoTokenizer.from_pretrained(args.basepath)
    dcfg = DraftConfig.from_hf_json(args.configpath, version=3)
    key = jax.random.PRNGKey(0)
    dparams = draft_mod.init_params(dcfg, key)
    dparams["embed"]["w"] = params["embed"]["w"]  # load_emb, cnets.py:488-519

    n_dev = len(jax.devices())
    n_data = args.data_parallel or n_dev
    mesh = shd.make_mesh(n_data=n_data, n_model=n_dev // n_data)
    params = shd.shard_params(params, mesh, shd.target_param_specs(cfg))
    dparams = shd.replicate(dparams, mesh)

    tcfg = ttt.TrainConfig(length=args.ttt_length, lr=args.lr,
                           warmup_steps=args.warmup_steps,
                           total_steps=args.total_steps,
                           grad_clip=args.grad_clip)
    opt = ttt.make_optimizer(tcfg)
    trainable, _ = ttt.partition_trainable(dparams)
    # ZeRO-analog: AdamW moments sharded over the data axis
    # (traineagle3/ds_config.json:32-41); params stay replicated. The
    # state is born sharded (init jitted with out_shardings) so the full
    # replicated fp32 moments never exist on any device.
    opt_state = (shd.init_sharded_zero_state(opt, trainable, mesh)
                 if n_data > 1 else shd.replicate(opt.init(trainable), mesh))

    start_epoch = 0
    restored = ckpt.restore_train_state(
        args.cpdir, like={"dparams": dparams, "opt_state": opt_state,
                          "step": 0, "metadata": {}})
    if restored is not None:
        dparams, opt_state = restored["dparams"], restored["opt_state"]
        start_epoch = int(restored["step"]) + 1
        print(f"[train] resumed from epoch {restored['step']}", flush=True)

    step_fn = jax.jit(lambda dp, os_, tp, b: ttt.train_step(
        dp, os_, tp, cfg, dcfg, tcfg, opt, b))

    with jax.set_mesh(mesh):
        for epoch in range(start_epoch, args.epochs):
            t0 = time.time()
            n_steps = 0
            losses, accs = [], []
            convs = data_mod.load_sharegpt(args.datapath)
            for batch_np in data_mod.batch_iterator(
                    tokenizer, convs, args.bs, max_len=args.max_len,
                    pad_to=args.max_len):
                batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
                dparams, opt_state, m = step_fn(dparams, opt_state, params,
                                                batch)
                n_steps += 1
                if n_steps % 20 == 0:
                    losses.append(float(m.loss))
                    accs.append(np.asarray(m.accs))
                    print(f"[train] epoch {epoch} step {n_steps} "
                          f"loss {losses[-1]:.4f} acc0 {accs[-1][0]:.3f}",
                          flush=True)
                    if args.metrics_file and jax.process_index() == 0:
                        import json
                        with open(args.metrics_file, "a") as mf:
                            mf.write(json.dumps({
                                "epoch": epoch, "step": n_steps,
                                "loss": float(m.loss),
                                "plosses": [float(x) for x in m.plosses],
                                "accs": [float(x) for x in m.accs],
                                "time": time.time(),
                            }) + "\n")
            print(f"[train] epoch {epoch} done: {n_steps} steps "
                  f"{time.time()-t0:.0f}s", flush=True)
            if (epoch + 1) % args.save_every_epochs == 0 and \
                    jax.process_index() == 0:
                path = ckpt.save_train_state(args.cpdir, epoch, dparams,
                                             opt_state)
                print(f"[train] saved {path}", flush=True)

    if args.export_safetensors and jax.process_index() == 0:
        ckpt.export_draft_safetensors(dparams, 3, args.export_safetensors)
        print(f"[train] exported {args.export_safetensors}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
