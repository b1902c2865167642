"""EAGLE-1/2 offline trainer CLI — the train/main.py analog, runnable
end-to-end:

    # 1. dump target features from tokenized conversations
    python -m eagle_tpu.train.cli_offline dump \
        --basepath /path/to/target --datapath sharegpt.jsonl --tmpdir feats/

    # 2. train the draft head on the dumped features
    python -m eagle_tpu.train.cli_offline train \
        --basepath /path/to/target --configpath vicuna_7B_config.json \
        --tmpdir feats/ --cpdir ckpts/ --bs 4 --epochs 20

Per-target draft configs ship in eagle_tpu/train/configs/ (the reference's
train/vicuna_7B_config.json etc.). Training runs data-parallel over all
devices when --data-parallel > 1 (grads psum-ed by XLA via shardings);
checkpoints/metrics/getkacc match the reference loop
(/root/reference/eagle/train/main.py:295-437).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "configs")


def _add_common(ap):
    ap.add_argument("--basepath", required=True,
                    help="target model checkpoint dir (HF format)")
    ap.add_argument("--tmpdir", required=True,
                    help="feature-shard directory (.npz)")
    ap.add_argument("--max-len", type=int, default=2048)


def cmd_dump(argv):
    ap = argparse.ArgumentParser(prog="cli_offline dump")
    _add_common(ap)
    ap.add_argument("--datapath", required=True,
                    help="sharegpt-style json/jsonl conversations")
    ap.add_argument("--model-type", default="vicuna",
                    help="chat template for tokenization")
    args = ap.parse_args(argv)

    from transformers import AutoTokenizer

    from ..models.hf_loader import load_target
    from . import data as data_mod
    from .offline import dump_features

    params, cfg = load_target(args.basepath)
    tokenizer = AutoTokenizer.from_pretrained(args.basepath)
    convs = data_mod.load_sharegpt(args.datapath)

    def sequences():
        for conv in convs:
            ex = data_mod.build_example(tokenizer, conv,
                                        max_len=args.max_len)
            if ex is None or len(ex["input_ids"]) < 8:
                continue
            yield ex

    n = dump_features(params, cfg, sequences(), args.tmpdir)
    print(f"[dump] wrote {n} shards to {args.tmpdir}", flush=True)


def cmd_train(argv):
    ap = argparse.ArgumentParser(prog="cli_offline train")
    _add_common(ap)
    ap.add_argument("--configpath", required=True,
                    help="draft EConfig json (see eagle_tpu/train/configs/)")
    ap.add_argument("--cpdir", default="./eagle_tpu_offline_ckpts")
    ap.add_argument("--lr", type=float, default=3e-5)
    ap.add_argument("--bs", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--v-w", type=float, default=1.0)
    ap.add_argument("--p-w", type=float, default=0.1)
    ap.add_argument("--noise", default="uniform",
                    choices=["uniform", "gaussian", "none"])
    ap.add_argument("--warmup-steps", type=int, default=2000)
    ap.add_argument("--total-steps", type=int, default=800000)
    ap.add_argument("--grad-clip", type=float, default=0.5)
    ap.add_argument("--save-freq", type=int, default=5,
                    help="epochs between checkpoints (main.py save_freq)")
    ap.add_argument("--getkacc-every", type=int, default=0,
                    help="epochs between k-step rollout evals (0 = off)")
    ap.add_argument("--metrics-file", default=None)
    ap.add_argument("--data-parallel", type=int, default=1,
                    help="data-parallel devices (1 = single device)")
    ap.add_argument("--export-safetensors", default=None)
    args = ap.parse_args(argv)

    from ..config import DraftConfig
    from ..models import draft as draft_mod
    from ..models.hf_loader import load_target
    from . import checkpoint as ckpt
    from . import offline

    params, cfg = load_target(args.basepath)
    dcfg = DraftConfig.from_hf_json(args.configpath, version=1)
    dparams = draft_mod.init_params(dcfg, jax.random.PRNGKey(0))
    dparams["embed"]["w"] = params["embed"]["w"]  # "embeding": True
    head_w = (params["embed"]["w"].T if cfg.tie_embeddings
              else params["lm_head"])

    ocfg = offline.OfflineTrainConfig(
        v_w=args.v_w, p_w=args.p_w, lr=args.lr,
        warmup_steps=args.warmup_steps, total_steps=args.total_steps,
        grad_clip=args.grad_clip, noise=args.noise, max_len=args.max_len)
    opt = offline.make_optimizer(ocfg)
    trainable, _ = offline.partition_trainable(dparams)
    opt_state = opt.init(trainable)

    mesh = None
    if args.data_parallel > 1:
        from ..parallel import sharding as shd
        mesh = shd.make_mesh(n_data=args.data_parallel, n_model=1)
        dparams = shd.replicate(dparams, mesh)
        opt_state = shd.replicate(opt_state, mesh)
        params = shd.replicate(params, mesh)

    start_epoch = 0
    restored = ckpt.restore_train_state(
        args.cpdir, like={"dparams": dparams, "opt_state": opt_state,
                          "step": 0, "metadata": {}})
    if restored is not None:
        dparams, opt_state = restored["dparams"], restored["opt_state"]
        start_epoch = int(restored["step"]) + 1
        print(f"[train] resumed from epoch {restored['step']}", flush=True)

    # head_w passed as an argument — closing it over the jit would bake a
    # [V,H] constant into the lowering (CLAUDE.md remote-compile rule)
    step_fn = jax.jit(lambda dp, os_, hw, b, k: offline.train_step(
        dp, os_, hw, dcfg, ocfg, opt, b, k))
    key = jax.random.PRNGKey(1)

    def epoch_batches(seed):
        return offline.load_feature_dataset_batched(
            args.tmpdir, args.bs, max_len=args.max_len, shuffle_seed=seed)

    from contextlib import nullcontext
    ctx = jax.set_mesh(mesh) if mesh is not None else nullcontext()
    with ctx:
        for epoch in range(start_epoch, args.epochs):
            t0 = time.time()
            n_steps = 0
            for batch in epoch_batches(epoch):
                key, sk = jax.random.split(key)
                dparams, opt_state, m = step_fn(dparams, opt_state, head_w,
                                                batch, sk)
                n_steps += 1
                if n_steps % 20 == 0:
                    print(f"[train] epoch {epoch} step {n_steps} "
                          f"loss {float(m.loss):.4f} "
                          f"top1 {float(m.top1):.3f}", flush=True)
                    if args.metrics_file and jax.process_index() == 0:
                        with open(args.metrics_file, "a") as mf:
                            mf.write(json.dumps({
                                "epoch": epoch, "step": n_steps,
                                "loss": float(m.loss),
                                "vloss": float(m.vloss),
                                "ploss": float(m.ploss),
                                "top1": float(m.top1),
                                "top3": float(m.top3),
                                "time": time.time(),
                            }) + "\n")
            print(f"[train] epoch {epoch} done: {n_steps} steps "
                  f"{time.time() - t0:.0f}s", flush=True)
            if args.getkacc_every and (epoch + 1) % args.getkacc_every == 0:
                batch = next(iter(epoch_batches(None)))
                accs = offline.getkacc(dparams, dcfg, head_w, batch, k=3)
                print(f"[train] getkacc: {np.round(accs, 3)}", flush=True)
            if (epoch + 1) % args.save_freq == 0 and \
                    jax.process_index() == 0:
                path = ckpt.save_train_state(args.cpdir, epoch, dparams,
                                             opt_state)
                print(f"[train] saved {path}", flush=True)

    if args.export_safetensors and jax.process_index() == 0:
        ckpt.export_draft_safetensors(dparams, 1, args.export_safetensors)
        print(f"[train] exported {args.export_safetensors}", flush=True)


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] not in ("dump", "train"):
        is_help = bool(argv) and argv[0] in ("-h", "--help")
        print("usage: python -m eagle_tpu.train.cli_offline "
              "{dump,train} [options]\n"
              f"shipped draft configs: {CONFIG_DIR}",
              file=sys.stdout if is_help else sys.stderr)
        return 0 if is_help else 2
    return {"dump": cmd_dump, "train": cmd_train}[argv[0]](argv[1:])


if __name__ == "__main__":
    sys.exit(main() or 0)
