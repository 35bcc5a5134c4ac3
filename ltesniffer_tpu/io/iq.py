"""IQ trace file IO (srsRAN complex-float binary format).

The reference's offline file mode reads raw interleaved float32 I/Q
(`srsran_ue_sync_init_file_multi`, `src/src/LTESniffer_Core.cc:252`); traces
recorded by the LTESniffer-record-subframe branch use the same layout.
"""
from __future__ import annotations

from typing import Iterator, Optional

import numpy as np


def read_iq(path: str, count: Optional[int] = None,
            offset_samples: int = 0) -> np.ndarray:
    """Load complex64 samples from an interleaved float32 file."""
    off = 8 * offset_samples
    cnt = -1 if count is None else count
    return np.fromfile(path, dtype=np.complex64, count=cnt, offset=off)


def write_iq(path: str, samples: np.ndarray):
    np.asarray(samples, dtype=np.complex64).tofile(path)


def stream_blocks(path: str, block_samples: int,
                  offset_samples: int = 0) -> Iterator[np.ndarray]:
    """Yield contiguous complex64 blocks from a trace file."""
    with open(path, "rb") as f:
        f.seek(8 * offset_samples)
        while True:
            buf = f.read(8 * block_samples)
            if len(buf) < 8:
                return
            yield np.frombuffer(buf, dtype=np.complex64)
