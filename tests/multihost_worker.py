"""Worker process for the REAL multi-host test (VERDICT r4 #3).

Launched by tests/test_multihost_real.py as N separate OS processes that
form an actual jax.distributed cluster on localhost (CPU backend, one
device per process). Each worker executes the production multi-host path:

  init_distributed()  ->  per-rank loader slicing (step_sampler columns,
  the reference DistributedSampler role, dataloader.py:113-120)  ->
  shard_batch(per_host=True) (make_array_from_process_local_data)  ->
  jitted train steps over the global 'data' mesh.

Run with --world 1 for the single-process baseline; the parent asserts the
2-process losses match it. Not a pytest module (no test_ prefix).
"""

import argparse
import json
import os.path as osp
import sys

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coord", default="")
    ap.add_argument("--rank", type=int, default=0)
    ap.add_argument("--world", type=int, default=1)
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--mem-pkl", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=2)
    args = ap.parse_args()

    import jax
    # keep the worker independent of the TPU plugin/tunnel (CLAUDE.md: env
    # JAX_PLATFORMS is ignored; config.update is the working override)
    jax.config.update("jax_platforms", "cpu")

    from gava_clip_tpu.parallel.distributed import init_distributed
    if args.world > 1:
        pidx, pcount = init_distributed(args.coord,
                                        num_processes=args.world,
                                        process_id=args.rank)
        # Initialize the gloo collective context NOW, while the processes
        # are still in lockstep (just launched): its first-rendezvous
        # deadline is 30 s, and the model build + first decode + compile
        # ahead of the first production collective can skew siblings past
        # that on a timeshared single core.
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("worker_init")
    else:
        pidx, pcount = init_distributed()
    assert (pidx, pcount) == (args.rank, args.world), (pidx, pcount)

    import numpy as np
    from gava_clip_tpu.data.loader import (LoaderConfig, create_memory_loader,
                                           create_train_loader)
    from gava_clip_tpu.models.prompts import PromptConfig
    from gava_clip_tpu.models.text import TextConfig
    from gava_clip_tpu.models.vision import VisionConfig
    from gava_clip_tpu.models.vita_clip import (VitaClip, VitaClipConfig,
                                                trainable_mask)
    from gava_clip_tpu.parallel.mesh import create_mesh, replicate, shard_batch
    from gava_clip_tpu.train.state import create_train_state, make_optimizer
    from gava_clip_tpu.train.step import LossConfig, make_train_step
    from gava_clip_tpu.utils.flagship import make_synthetic_knowledge_dir

    n_cls = 3
    kdir = make_synthetic_knowledge_dir(n_cls, ("v1",))  # seed=0: identical
    cfg = VitaClipConfig(
        vision=VisionConfig(input_size=(32, 32), num_frames=2, feature_dim=32,
                            patch_size=(16, 16), heads=2, layers=2,
                            mlp_factor=2.0, embed_dim=32,
                            use_summary_token=True, use_local_prompts=True,
                            use_global_prompts=True, num_global_prompts=2),
        text=TextConfig(embed_dim=32, width=32, heads=2, layers=2),
        num_classes=n_cls, use_text_prompt_learning=True,
        prompt=PromptConfig(n_cls=n_cls, n_ctx=4, ctx_dim=32, emb_dim=8,
                            init="cntn_split_uni_disc", csc=True,
                            knowledge_versions=("v1",), knowledge_dir=kdir),
        use_support_memory=True, add_nte=True)
    # PRNGKey(0) default init: bit-identical params in every process
    model = VitaClip(cfg, classnames=["normal", "slight difficulty",
                                      "moderate difficulty"])

    GLOBAL_B, GLOBAL_MEM_B = 4, 8
    lcfg = LoaderConfig(
        train_list_path=osp.join(args.data_root, "train_updrs.csv"),
        data_root=args.data_root, batch_size=GLOBAL_B, num_frames=2,
        sampling_rate=1, spatial_size=32, num_workers=1,
        num_steps=args.steps, add_nte=True, use_support_memory=True,
        memory_data_path=args.mem_pkl, mem_batch_size=GLOBAL_MEM_B,
        embed_dim=32, type="updrs")
    # the production slicing: step_sampler columns per (rank, world)
    train_it = iter(create_train_loader(lcfg, rank=pidx, world_size=pcount))
    mem_it = iter(create_memory_loader(lcfg, rank=pidx, world_size=pcount))

    mask = trainable_mask(model.params, cfg)
    opt = make_optimizer(lr=1e-3, num_steps=args.steps, weight_decay=0.2)

    # global mesh: one CPU device per process (world>1), else all local
    mesh = create_mesh()
    state = replicate(create_train_state(model.params, mask, opt), mesh)
    loss_cfg = LossConfig(num_classes=n_cls, focal_ordinal=True,
                          use_support_memory=True, add_nte=True)
    step = make_train_step(model, loss_cfg, opt, donate=True)

    losses = []
    for _ in range(args.steps):
        b = next(train_it)
        m = next(mem_it)
        host_batch = {
            "video": b["video"].astype(np.float32) / 255.0,
            "labels": b["labels"].astype(np.int32),
            "nte": b["nte"].astype(np.float32),
            "memory": m["memory"],
            "mt_labels": m["mt_labels"],
        }
        batch = shard_batch(host_batch, mesh, per_host=True)
        # each leaf must have assembled to the GLOBAL batch
        assert batch["video"].shape[0] == GLOBAL_B, batch["video"].shape
        assert batch["memory"].shape[0] == GLOBAL_MEM_B
        state, metrics = step(state, batch)
        losses.append(float(metrics["total"]))  # replicated -> addressable

    rec = {"rank": pidx, "world": pcount,
           "process_count": int(jax.process_count()),
           "global_devices": int(jax.device_count()),
           "local_devices": len(jax.local_devices()),
           "mesh": dict(mesh.shape), "losses": losses}
    with open(args.out, "w") as f:
        json.dump(rec, f)
    print("worker done:", json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
