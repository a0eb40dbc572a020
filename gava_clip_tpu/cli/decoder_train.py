"""DeCap decoder training — counterpart of reference training/decoder_train.py.

Trains the GPT-2-style gait-caption decoder on the memory-bank pickle
(tokens + mean sentence embeddings): AdamW, linear warmup schedule, token CE
(ignore 0, smoothing .1) + ordinal number loss, best-accuracy checkpointing.
One jitted train step; data shuffling is host-side.
"""

import argparse
import os
import os.path as osp
import pickle
import time
from typing import Tuple

import numpy as np

from ..models.decap import DecapConfig, decap_loss, init_decap_params
from .train import _log


class ClipGaitDataset:
    """tokens (N, 77) + unit-normalized mean sentence embeddings (N, 512)
    from the memory-bank pickle (decoder_train.py:32-118)."""

    def __init__(self, data_path: str):
        with open(data_path, "rb") as f:
            data = pickle.load(f)
        self.tokens = np.asarray(data["tokens"], np.int32)
        embeds = np.asarray(data["embeds"], np.float32)
        if embeds.ndim == 3:
            embeds = embeds.mean(-2)
        self.embeds = embeds / np.linalg.norm(embeds, axis=-1, keepdims=True)
        assert len(self.tokens) == len(self.embeds)

    def __len__(self):
        return len(self.tokens)


def linear_warmup_schedule(lr: float, warmup_steps: int, total_steps: int):
    import optax
    return optax.join_schedules([
        optax.linear_schedule(0.0, lr, warmup_steps),
        optax.linear_schedule(lr, 0.0, max(total_steps - warmup_steps, 1)),
    ], [warmup_steps])


def train_decoder(args) -> str:
    import jax
    import jax.numpy as jnp
    import optax

    cfg = DecapConfig(prefix_size=args.prefix_size,
                      vocab_size=args.vocab_size + 500,
                      base_vocab=args.vocab_size)
    params = init_decap_params(jax.random.PRNGKey(42), cfg)

    train_ds = ClipGaitDataset(args.train_data)
    val_ds = ClipGaitDataset(args.valid_data) if args.valid_data else None

    steps_per_epoch = len(train_ds) // args.bs
    total_steps = args.epochs * steps_per_epoch
    opt = optax.adamw(linear_warmup_schedule(args.lr, args.warmup_steps,
                                             total_steps))
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, embeds, tokens):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: decap_loss(p, embeds, tokens, cfg), has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, metrics

    @jax.jit
    def eval_step(params, embeds, tokens):
        return decap_loss(params, embeds, tokens, cfg)[1]["acc"]

    os.makedirs(args.output_dir, exist_ok=True)
    best_acc = 0.0
    best_path = osp.join(args.output_dir, "decap-best.ckpt")
    rs = np.random.RandomState(42)
    step = 0
    for epoch in range(args.epochs):
        order = rs.permutation(len(train_ds))
        accs = []
        for i in range(steps_per_epoch):
            idx = order[i * args.bs:(i + 1) * args.bs]
            params, opt_state, loss, metrics = train_step(
                params, opt_state, jnp.asarray(train_ds.embeds[idx]),
                jnp.asarray(train_ds.tokens[idx]))
            accs.append(float(metrics["acc"]))
            step += 1
            if step % args.print_freq == 0:
                _log(f"epoch {epoch} step {step} loss {float(loss):.4f} "
                     f"acc {accs[-1]:.4f}")
        epoch_acc = float(np.mean(accs))
        if val_ds is not None:
            v_accs = []
            for i in range(0, len(val_ds) - args.bs + 1, args.bs):
                v_accs.append(float(eval_step(
                    params, jnp.asarray(val_ds.embeds[i:i + args.bs]),
                    jnp.asarray(val_ds.tokens[i:i + args.bs]))))
            epoch_acc = float(np.mean(v_accs)) if v_accs else epoch_acc
        _log(f"epoch {epoch}: acc {epoch_acc:.4f}")
        if epoch_acc >= best_acc:
            best_acc = epoch_acc
            with open(best_path, "wb") as f:
                pickle.dump({"params": jax.tree_util.tree_map(np.asarray, params),
                             "config": cfg.__dict__}, f)
    return best_path


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--train_data", type=str, required=True)
    parser.add_argument("--valid_data", type=str, default="")
    parser.add_argument("--output_dir", type=str, default="./decap/ckpt")
    parser.add_argument("--bs", type=int, default=64)
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--lr", type=float, default=1e-5)
    parser.add_argument("--warmup_steps", type=int, default=1000)
    parser.add_argument("--vocab_size", type=int, default=49408)
    parser.add_argument("--prefix_size", type=int, default=512)
    parser.add_argument("--print_freq", type=int, default=50)
    args = parser.parse_args(argv)
    return train_decoder(args)


if __name__ == "__main__":
    main()
