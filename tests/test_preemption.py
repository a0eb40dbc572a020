"""Preemption-safe checkpointing: SIGTERM to a running train driver must
produce a resumable checkpoint and a clean exit (the preemptible-TPU-VM
contract — the host sends SIGTERM with a grace window)."""

import os
import signal
import subprocess
import sys
import time

from tests.test_cli_train import _make_assets, _make_dataset

_RUNNER = """
import sys
import jax
# the axon TPU plugin ignores JAX_PLATFORMS; force the cpu platform before
# any device use (CLAUDE.md) so this subprocess never touches the relay
jax.config.update("jax_platforms", "cpu")
from gava_clip_tpu.cli.train import main
main(sys.argv[1:])
"""


def test_sigterm_checkpoints_and_exits_cleanly(tmp_path):
    _make_dataset(tmp_path)
    classes = _make_assets(tmp_path)
    argv = [
        sys.executable, "-c", _RUNNER,
        "--nfold", "1", "--type", "updrs",
        "--data_root", str(tmp_path),
        "--text_prompt_classes_path", str(classes),
        # long horizon + saves pushed out of reach: the ONLY checkpoint that
        # can exist is the preemption save
        "--num_steps", "5000", "--eval_freq", "10000",
        "--save_freq", "10000",
        "--print_freq", "1", "--batch_size", "2", "--num_frames", "2",
        "--spatial_size", "32", "--patch_size", "16",
        "--num_layers", "2", "--num_heads", "2", "--feature_dim", "32",
        "--embed_dim", "32", "--mlp_factor", "2.0",
        "--text_transformer_width", "32", "--text_transformer_heads", "2",
        "--text_transformer_layers", "2", "--text_num_prompts", "2",
        "--use_text_prompt_learning", "--use_text_prompt_CSC",
        "--text_prompt_init", "cntn_split_uni_disc",
        "--knowledge_version", "v1",
        "--knowledge_dir", str(tmp_path / "ke_updrs"),
        "--lr", "1e-3", "--num_workers", "2", "--no_mirror",
    ]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.Popen(argv, cwd=str(tmp_path),
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True, env=env)
    # wait until the loop is demonstrably running (a step line), then preempt
    saw_step = False
    deadline = time.time() + 420
    lines = []
    while time.time() < deadline:
        line = proc.stdout.readline()
        if not line:
            break
        lines.append(line)
        if "step 2 " in line:
            saw_step = True
            proc.send_signal(signal.SIGTERM)
            break
    assert saw_step, "driver never reached step 2:\n" + "".join(lines[-30:])
    out, _ = proc.communicate(timeout=300)
    assert proc.returncode == 0, out[-2000:]
    assert "[preempt]" in out, out[-2000:]
    # the preemption checkpoint exists and is resumable
    logdir = next((tmp_path / "logs").iterdir())
    fold_dirs = [d for d in logdir.iterdir() if d.name.startswith("fold_")]
    ckpts = [p for d in fold_dirs for p in d.glob("checkpoint-*.ckpt")]
    assert ckpts, f"no preemption checkpoint under {logdir}"
    from gava_clip_tpu.train import checkpoint as ckpt_lib
    ck = ckpt_lib.load_checkpoint(str(ckpts[0]))
    assert ck["next_step"] >= 2
    assert "params" in ck and "opt_state" in ck
