"""Production inference serving.

A compiled-once classifier around the zero-shot path: uint8 clips in,
class probabilities out. Weights live on device in bf16, inputs are padded
to a fixed serving batch so a single executable handles any request size,
and preprocessing (keep-aspect resize + center crop) runs through the
native framepipe on the host with normalization fused on device.

    clf = VideoClassifier.from_model(model, classnames=[...])
    probs = clf.classify_clips(clips_u8)        # (N, T, S, S, 3) uint8
    label, probs = clf.classify_video("walk.mp4")
"""

from dataclasses import dataclass
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from .data.device_preprocess import CLIP_MEAN, CLIP_STD, normalize_frames
from .data import video as V


class VideoClassifier:

    def __init__(self, model, params: Dict, classnames: Sequence[str],
                 batch_size: int = 16, mean=CLIP_MEAN, std=CLIP_STD,
                 compute_dtype=None, attn_impl: Optional[str] = None,
                 quantize=False, mesh=None, patch_major: bool = False,
                 pad_buckets: bool = True):
        """mesh: optional `jax.sharding.Mesh` with a 'data' axis — the
        serving batch shards across it (weights replicated), scaling
        throughput linearly over ICI with no inter-chip collectives except
        the output gather. batch_size must divide evenly by the axis.

        patch_major: ship clips to the device as raw uint8 patch rows
        (models/vision.py patchify — same bytes, reordered on host) with the
        normalization FOLDED into the patch-embed weights, so the prologue
        is one contiguous GEMM: no conv relayout, no normalize pass, and in
        w8a8 mode the embed runs on the int8 MXU (bench: 710.9 clips/s
        w8a8+patch-major vs 698.9 w8a8-frames at B=16). The host-side
        patchify is a cheap numpy relayout.

        pad_buckets: pad partial batches to the next power of two instead
        of the full serving batch. H2D bytes dominate partial-batch cost
        (a 224^2 8f clip is 1.2 MB; padding 7 requests to 16 doubles the
        transfer), so buckets [1,2,4,8,...,batch_size] transfer only what
        the occupancy needs, at the price of one compiled executable per
        bucket (warmup() compiles them all). Disabled automatically under
        a mesh (bucket sizes would have to divide the data axis)."""
        import jax
        import jax.numpy as jnp
        from .utils.jax_cache import enable_compilation_cache
        enable_compilation_cache()  # serving cold-start: reload compiled fwd
        self.model = model
        self.classnames = list(classnames)
        self.batch_size = batch_size
        self.num_frames = model.cfg.vision.num_frames
        self.spatial_size = model.cfg.vision.input_size[0]
        self.mesh = mesh
        self.patch_major = patch_major
        self._patch_size = model.cfg.vision.patch_size
        if patch_major:
            from .models.vision import fold_normalize_into_patch_embed
            visual = dict(params["visual"])
            visual["patch_embed"] = fold_normalize_into_patch_embed(
                visual["patch_embed"], mean, std, self._patch_size)
            params = dict(params)
            params["visual"] = visual
        self.pad_buckets = bool(pad_buckets) and mesh is None
        if mesh is not None and batch_size % mesh.shape["data"] != 0:
            raise ValueError(
                f"serving batch {batch_size} must be divisible by the mesh "
                f"data axis ({mesh.shape['data']})")
        compute_dtype = compute_dtype or jnp.bfloat16
        attn_impl = attn_impl or (
            "flash" if jax.default_backend() == "tpu" else "xla")

        if quantize:
            # quantize=True or "w8": weight-only int8 projections via the
            # Pallas dequant-GEMM (ops/int8_matmul.py; wired through
            # ops.linear). Measured on v5e: 5% faster at B=1 (weight-
            # bandwidth bound) — the latency-serving mode.
            # quantize="w8a8": dynamic per-token activation quant + int8
            # MXU GEMMs — the throughput-serving mode (~2x bf16 MXU peak).
            from .ops.quant import quantize_tower_params
            self.params = quantize_tower_params(
                params, act_quant=(quantize == "w8a8"))
        else:
            # bf16 weights: halves HBM traffic and host->device bytes.
            # dtype is inspected WITHOUT np.asarray — materializing a
            # device-committed leaf through the serialized relay just to
            # read its dtype is the trap quant.prepare_inference_params
            # already fixed (ADVICE r3)
            self.params = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "astype")
                and jnp.issubdtype(x.dtype, jnp.floating) else x,
                params)
        # commit weights to device once (numpy args re-transfer every call)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            replicated = NamedSharding(mesh, PartitionSpec())
            self._data_sharding = NamedSharding(mesh, PartitionSpec("data"))
            self.params = jax.device_put(self.params, replicated)
            buffers = jax.device_put(model.buffers, replicated)
        else:
            self._data_sharding = None
            dev = jax.local_devices()[0]  # a device this process owns
            self.params = jax.device_put(self.params, dev)
            buffers = jax.device_put(model.buffers, dev)

        def _fwd(p, clips_u8):
            if self.patch_major:
                # normalization is folded into the patch-embed weights:
                # raw uint8 patch rows go straight into the GEMM
                x = clips_u8.astype(compute_dtype)
                out = model.apply(p, buffers, x, compute_dtype=compute_dtype,
                                  attn_impl=attn_impl,
                                  input_format="patches")
            else:
                x = normalize_frames(clips_u8, mean, std)
                out = model.apply(p, buffers, x, compute_dtype=compute_dtype,
                                  attn_impl=attn_impl)
            return jax.nn.softmax(out["logits"], axis=-1)

        if mesh is not None:
            # shard_map over the data axis: each device runs the whole tower
            # (incl. Pallas kernels) on its local batch slice — no
            # collectives; the output gather is the only cross-chip traffic
            from jax.sharding import PartitionSpec as P
            self._forward = jax.jit(jax.shard_map(
                _fwd, mesh=mesh, in_specs=(P(), P("data")),
                out_specs=P("data"), check_vma=False))
        else:
            self._forward = jax.jit(_fwd)

    @classmethod
    def from_model(cls, model, classnames: Sequence[str], **kw):
        return cls(model, model.params, classnames, **kw)

    def _buckets(self):
        if not self.pad_buckets:
            return [self.batch_size]
        out = []
        b = 1
        while b < self.batch_size:
            out.append(b)
            b *= 2
        return out + [self.batch_size]

    def _bucket(self, k: int) -> int:
        for b in self._buckets():
            if k <= b:
                return b
        return self.batch_size

    def warmup(self):
        for b in self._buckets():
            dummy = np.zeros((b, self.num_frames, self.spatial_size,
                              self.spatial_size, 3), np.uint8)
            if self.patch_major:
                from .models.vision import patchify
                dummy = patchify(dummy, self._patch_size)
            np.asarray(self._forward(self.params, dummy))
        return self

    def classify_clips(self, clips_u8: np.ndarray) -> np.ndarray:
        """(N, T, S, S, 3) uint8 -> (N, n_cls) probabilities. Requests are
        padded to the next bucket (power of two up to the serving batch;
        one compiled executable per bucket, see pad_buckets)."""
        import jax.numpy as jnp
        n = clips_u8.shape[0]
        probs = []
        for i in range(0, n, self.batch_size):
            chunk = clips_u8[i:i + self.batch_size]
            k = chunk.shape[0]
            b = self._bucket(k)
            if k < b:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], b - k, axis=0)])
            if self.patch_major:
                from .models.vision import patchify
                chunk = patchify(np.ascontiguousarray(chunk),
                                 self._patch_size)
            chunk = jnp.asarray(chunk)
            if self._data_sharding is not None:
                import jax
                chunk = jax.device_put(chunk, self._data_sharding)
            p = np.asarray(self._forward(self.params, chunk))[:k]
            probs.append(p)
        return np.concatenate(probs, axis=0)

    def prepare_video(self, path: str, sampling_rate: int = 1) -> np.ndarray:
        """Decode + sample + resize/crop one video to a serving clip."""
        n = V.video_num_frames(path)
        idx = V.temporal_crop_indices(n, self.num_frames, sampling_rate, 1)[0]
        frames = V.decode_frames(path, indices=idx)
        frames = V.keep_aspect_resize(frames, self.spatial_size)
        return V.center_crop(frames, self.spatial_size)

    def classify_video(self, path: str) -> Tuple[str, np.ndarray]:
        clip = self.prepare_video(path)
        probs = self.classify_clips(clip[None])[0]
        return self.classnames[int(np.argmax(probs))], probs
