"""Multi-host init helper (single-host no-op path)."""

import numpy as np

from gava_clip_tpu.parallel.distributed import (init_distributed,
                                                local_batch_slice)


def test_single_host_noop():
    idx, count = init_distributed()
    assert idx == 0 and count >= 1


def test_local_batch_slice():
    assert local_batch_slice(8) == 8  # single process
