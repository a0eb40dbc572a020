"""Host-side video decode + frame sampling (cv2/FFmpeg backend).

The reference decodes EVERY frame with PyAV and then samples
(video_dataset/dataset.py:85-95). Here decode is need-driven: frame indices
are chosen first and only those frames are converted — and the heavy
resize/crop runs on uint8 via cv2 SIMD, shipping compact uint8 tensors to
the device where normalization fuses into the patch-embed matmul.
"""

import os
import os.path as osp
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

try:
    import cv2
    cv2.setNumThreads(0)  # thread pool is managed by the loader
except ImportError:  # pragma: no cover
    cv2 = None

NUM_COMB = 70


def parse_data_list(list_path: str) -> List[Tuple[str, int]]:
    """`<path>,<label>` per line (reference dataset.py:81-83)."""
    out = []
    with open(list_path) as f:
        for line in f.read().splitlines():
            if not line.strip():
                continue
            path, label = line.rsplit(",", 1)
            out.append((path, int(label)))
    return out


def parse_classes_file(path: str) -> Tuple[List[str], List[str]]:
    """Returns (classnames, class_labels). Lines starting with '*' are class
    labels and their count defines num_classes (reference train.py:187-195,
    VitaCLIP_model.py:203-205)."""
    with open(path) as f:
        lines = [x for x in f.read().strip().split("\n") if x.strip()]
    classnames = [x for x in lines if x[0] != "*"]
    labels = [x[1:] for x in lines if x[0] == "*"]
    if not labels:
        # generic action lists (k400/ucf/hmdb) carry no '*' lines; every line
        # is a class (fixes reference quirk SURVEY.md §2.8-3 where CLS_NUM=0)
        labels = list(classnames)
    return classnames, labels


# seek only pays when skipping more than roughly one GOP: an ffmpeg
# POS_FRAMES seek lands on the keyframe before the target and decodes
# forward internally, so short gaps are cheaper to read through.
SEEK_MIN_GAP = 32


def decode_frames(path: str, indices: Optional[Sequence[int]] = None,
                  allow_seek: bool = True) -> np.ndarray:
    """Decode a video to RGB uint8 frames (T, H, W, 3). If `indices` is given,
    only those (sorted, possibly repeated) frames are returned.

    Unlike the reference's decode-everything-then-sample
    (video_dataset/dataset.py:85-95), sparse index sets use real
    CAP_PROP_POS_FRAMES seeking when a gap exceeds SEEK_MIN_GAP. Every seek
    is validated by reading back the landing position: undershoot just
    reads forward (still exact), overshoot/bogus disables seeking and
    falls back to one sequential pass. Caveat: the landing check reads
    CAP_PROP_POS_FRAMES, which the FFmpeg backend derives from the seek
    request rather than decoded content — on well-formed constant-frame-rate
    containers the result is identical to a sequential decode, but VFR or
    broken-timestamp files can pass the check while landing on a different
    frame. Parity-sensitive evals on unreliable containers should pass
    allow_seek=False (exposed as VideoDatasetConfig/LoaderConfig.allow_seek
    and the --no_seek_decode driver flag) to force the reference's
    sequential decode. Measured numbers: tools/bench_host_pipeline.py,
    "8 TSN frames from a 300-frame clip"."""
    assert cv2 is not None, "OpenCV is required for video decode"
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"cannot open video: {path}")
    frames = []
    if indices is None:
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    else:
        want = list(indices)
        decoded = {}
        pos = 0                       # index of the next frame cap will return
        seek_ok = allow_seek
        for i in sorted(set(want)):
            if i < pos:               # already passed (only after a re-open)
                continue
            if seek_ok and i - pos > SEEK_MIN_GAP:
                cap.set(cv2.CAP_PROP_POS_FRAMES, i)
                landed = int(cap.get(cv2.CAP_PROP_POS_FRAMES))
                if 0 <= landed <= i:
                    pos = landed
                else:                 # unreliable seek: restart sequentially
                    seek_ok = False
                    cap.release()
                    cap = cv2.VideoCapture(path)
                    pos = 0
            ok = True
            while ok and pos <= i:
                ok, frame = cap.read()
                if ok:
                    if pos == i:
                        decoded[i] = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
                    pos += 1
            if not ok:
                break                 # ran off the end; clamp below
        if not decoded:
            raise IOError(f"no frames decoded: {path}")
        last = max(decoded)
        frames = [decoded.get(min(i, last), decoded[last]) for i in want]
    cap.release()
    return np.stack(frames)


def video_num_frames(path: str) -> int:
    assert cv2 is not None
    cap = cv2.VideoCapture(path)
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    if n <= 0:
        # fallback: count by decoding
        n = 0
        while cap.read()[0]:
            n += 1
    cap.release()
    return n


def sample_frame_indices(num_video_frames: int, num_frames: int,
                         sampling_rate: int, random_sample: bool,
                         rng: Optional[np.random.RandomState] = None) -> List[int]:
    """Random/TSN/strided sampling (reference dataset.py:202-217)."""
    rng = rng or np.random
    if random_sample:
        if sampling_rate < 0:  # TSN
            seg = (num_video_frames - 1) / num_frames
            return [int(rng.randint(round(seg * i), round(seg * (i + 1)) + 1))
                    for i in range(num_frames)]
        if sampling_rate * (num_frames - 1) + 1 >= num_video_frames:
            out = []
            for i in range(num_frames):
                out.append(i * sampling_rate if i * sampling_rate < num_video_frames
                           else out[-1])
            return out
        start = int(rng.randint(num_video_frames - sampling_rate * (num_frames - 1)))
        return list(range(start, start + sampling_rate * num_frames, sampling_rate))
    raise ValueError("use temporal_crop_indices for deterministic sampling")


def temporal_crop_indices(num_video_frames: int, num_frames: int,
                          sampling_rate: int, num_temporal_views: int) -> List[List[int]]:
    """Deterministic temporal crops incl. last-frame padding
    (reference _generate_temporal_crops, dataset.py:160-175)."""
    seg_len = (num_frames - 1) * sampling_rate + 1
    padded_len = max(num_video_frames, seg_len)
    slide = padded_len - seg_len
    crops = []
    for i in range(num_temporal_views):
        st = slide // 2 if num_temporal_views == 1 else round(
            slide / (num_temporal_views - 1) * i)
        idx = [min(st + k * sampling_rate, num_video_frames - 1)
               for k in range(num_frames)]
        crops.append(idx)
    return crops


def keep_aspect_resize(frames: np.ndarray, spatial_size: int,
                       interpolation=None, use_native: bool = False) -> np.ndarray:
    """Short-side resize on uint8 frames (reference dataset.py:124-133),
    bilinear with half-pixel centers (~ torch align_corners=False).

    cv2's SIMD fixed-point bilinear is the fast path (measured 2.2 ms vs
    11.6 ms for the scalar C++ framepipe per 8x256x340 clip); the native
    framepipe serves as a cv2-free fallback and for explicit opt-in."""
    T, H, W, C = frames.shape
    if H < W:
        new_h, new_w = spatial_size, W * spatial_size // H
    else:
        new_h, new_w = H * spatial_size // W, spatial_size
    if (use_native or cv2 is None) and frames.dtype == np.uint8 \
            and interpolation is None:
        from . import native
        if native.available():
            return native.resize_bilinear(frames, new_h, new_w)
    assert cv2 is not None
    interpolation = interpolation or cv2.INTER_LINEAR
    out = np.empty((T, new_h, new_w, C), frames.dtype)
    for t in range(T):
        out[t] = cv2.resize(frames[t], (new_w, new_h), interpolation=interpolation)
    return out


def center_crop(frames: np.ndarray, size: int) -> np.ndarray:
    H, W = frames.shape[1:3]
    h0 = (H - size) // 2
    w0 = (W - size) // 2
    return frames[:, h0:h0 + size, w0:w0 + size]


def spatial_crops(frames: np.ndarray, size: int, num_views: int) -> List[np.ndarray]:
    """1 center crop or 3 sliding crops (reference dataset.py:178-199)."""
    H, W = frames.shape[1:3]
    if num_views == 1:
        assert min(H, W) >= size
        return [center_crop(frames, size)]
    if num_views == 3:
        assert min(H, W) == size
        margin = max(H, W) - size
        crops = []
        for st in (0, margin // 2, margin):
            if H > W:
                crops.append(frames[:, st:st + size, :])
            else:
                crops.append(frames[:, :, st:st + size])
        return crops
    raise NotImplementedError(num_views)


def random_resized_crop_params(height: int, width: int,
                               scale=(0.08, 1.0), ratio=(3.0 / 4.0, 4.0 / 3.0),
                               rng: Optional[np.random.RandomState] = None,
                               max_tries: int = 10) -> Tuple[int, int, int, int]:
    """Inception-style crop box (reference transform.py _get_param_spatial_crop
    semantics: area/log-ratio sampling with center fallback)."""
    rng = rng or np.random
    area = height * width
    for _ in range(max_tries):
        target_area = float(rng.uniform(*scale)) * area
        ar = float(np.exp(rng.uniform(np.log(ratio[0]), np.log(ratio[1]))))
        w = int(round(np.sqrt(target_area * ar)))
        h = int(round(np.sqrt(target_area / ar)))
        if 0 < w <= width and 0 < h <= height:
            i = int(rng.randint(0, height - h + 1))
            j = int(rng.randint(0, width - w + 1))
            return i, j, h, w
    # fallback: center crop at in-range aspect
    in_ratio = width / height
    if in_ratio < ratio[0]:
        w, h = width, int(round(width / ratio[0]))
    elif in_ratio > ratio[1]:
        h, w = height, int(round(height * ratio[1]))
    else:
        w, h = width, height
    return (height - h) // 2, (width - w) // 2, h, w


def random_short_side_scale_jitter(frames: np.ndarray, min_size: int,
                                   max_size: int,
                                   inverse_uniform_sampling: bool = False,
                                   rng: Optional[np.random.RandomState] = None
                                   ) -> np.ndarray:
    """Short-side scale jitter (reference transform.py:48-102 semantics on
    (T, H, W, C) frames): sample a target short side uniformly in
    [min_size, max_size] (or as a reciprocal of a uniform inverse-scale),
    bilinear-resize keeping aspect. Dead in the reference train path but part
    of its public transform surface."""
    rng = rng or np.random
    if inverse_uniform_sampling:
        size = int(round(1.0 / rng.uniform(1.0 / max_size, 1.0 / min_size)))
    else:
        size = int(round(rng.uniform(min_size, max_size)))
    T, H, W, C = frames.shape
    if (W <= H and W == size) or (H <= W and H == size):
        return frames
    new_h = new_w = size
    if W < H:
        new_h = int(np.floor(float(H) / W * size))
    else:
        new_w = int(np.floor(float(W) / H * size))
    assert cv2 is not None
    out = np.empty((T, new_h, new_w, C), frames.dtype)
    for t in range(T):
        out[t] = cv2.resize(frames[t], (new_w, new_h),
                            interpolation=cv2.INTER_LINEAR)
    return out


def horizontal_flip(prob: float, frames: np.ndarray,
                    rng: Optional[np.random.RandomState] = None) -> np.ndarray:
    """Standalone horizontal flip with probability `prob` (reference
    transform.py:160-192 on (T, H, W, C) frames; the box branch is unused by
    the reference video path)."""
    rng = rng or np.random
    if rng.uniform() < prob:
        return frames[:, :, ::-1]
    return frames


def resized_crop_with_shift(frames: np.ndarray, size: int,
                            box_first, box_last) -> np.ndarray:
    """Deterministic core of random_resized_crop_with_shift (reference
    transform.py:580-622): linearly interpolate two (i, j, h, w) crop boxes
    across frames, crop + bilinear-resize each frame to size x size."""
    assert cv2 is not None
    T = frames.shape[0]
    coords = np.stack([np.linspace(a, b, T) for a, b in
                       zip(box_first, box_last)], axis=1).astype(int)
    out = np.empty((T, size, size, frames.shape[3]), frames.dtype)
    for t, (i, j, h, w) in enumerate(coords):
        out[t] = cv2.resize(frames[t, i:i + h, j:j + w], (size, size),
                            interpolation=cv2.INTER_LINEAR)
    return out


def random_resized_crop_with_shift(frames: np.ndarray, size: int,
                                   scale=(0.8, 1.0),
                                   ratio=(3.0 / 4.0, 4.0 / 3.0),
                                   rng: Optional[np.random.RandomState] = None
                                   ) -> np.ndarray:
    """Per-frame shifted random resized crop (reference transform.py:580-622):
    two independent crop boxes for the first and last frame, linearly
    interpolated for the frames between."""
    H, W = frames.shape[1:3]
    b0 = random_resized_crop_params(H, W, scale, ratio, rng)
    b1 = random_resized_crop_params(H, W, scale, ratio, rng)
    return resized_crop_with_shift(frames, size, b0, b1)


def random_resized_crop(frames: np.ndarray, size: int,
                        scale=(0.08, 1.0), ratio=(3.0 / 4.0, 4.0 / 3.0),
                        rng: Optional[np.random.RandomState] = None,
                        use_native: bool = False) -> np.ndarray:
    """Temporally-consistent random resized crop on uint8 frames."""
    i, j, h, w = random_resized_crop_params(frames.shape[1], frames.shape[2],
                                            scale, ratio, rng)
    if (use_native or cv2 is None) and frames.dtype == np.uint8:
        from . import native
        if native.available():
            return native.crop_resize(frames, i, j, h, w, size, size)
    cropped = frames[:, i:i + h, j:j + w]
    out = np.empty((frames.shape[0], size, size, frames.shape[3]), frames.dtype)
    for t in range(cropped.shape[0]):
        out[t] = cv2.resize(cropped[t], (size, size), interpolation=cv2.INTER_LINEAR)
    return out
