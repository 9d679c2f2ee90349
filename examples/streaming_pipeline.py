"""Streaming pipeline walkthrough: chunk-fed encode, pipelined decode.

Two round-5 surfaces for producers/consumers that never hold the whole
workload at once:

* ``ChunkedLongStreamEncoder`` encodes ONE long AIRSPACE block from
  chunk-sized sample feeds with a device-resident carry — ``feed_many``
  consumes a whole (K, chunk) buffer per device dispatch, so the launch
  cost amortizes over the feed buffer and chunk uploads overlap encode
  on real hardware.  The output is byte-identical to the one-shot
  ``compress_long_stream``.
* ``BatchDecompressor.decompress_stream`` decodes consecutive frame
  batches with the host staging of batch k+1 overlapping the device
  decode of batch k, coalescing sub-tile batches into full kernel
  launches; checksums verify on device.

Runs on any JAX backend (CPU works; conftest-free standalone script).
"""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

import airs_compression_tpu as act
from airs_compression_tpu.models.stream import (
    BatchCompressor,
    BatchDecompressor,
)
from airs_compression_tpu.parallel.sp import (
    ChunkedLongStreamEncoder,
    compress_long_stream,
    decompress_long_stream,
    stream_chunk_index,
)


def main() -> int:
    from jax.sharding import Mesh

    params = act.CmpParams(
        primary_preprocessing=act.Preprocessing.DIFF,
        primary_encoder_type=act.EncoderType.GOLOMB_ZERO,
        primary_encoder_param=4,
        checksum_enabled=True,
    )
    rng = np.random.default_rng(0)

    # --- streaming encode of one long acquisition --------------------
    n, chunk = 1 << 15, 1 << 12
    mesh = Mesh(np.array(jax.devices()[: min(4, len(jax.devices()))]),
                ("sp",))
    stream = ((1100 + rng.normal(0, 6, n)).astype(np.int64)
              & 0xFFFF).astype(np.uint16)

    enc = ChunkedLongStreamEncoder(mesh, params, n, chunk, identifier=7)
    bufs = stream.reshape(-1, 2, chunk)  # producer hands 2 chunks a time
    for k in range(bufs.shape[0]):
        enc.feed_many(bufs[k])
    frame = enc.finish()
    assert frame == compress_long_stream(mesh, params, stream,
                                         identifier=7)
    print(f"chunk-fed encode: {n} samples -> {len(frame)} bytes, "
          f"byte-identical to the one-shot sharded frame")

    # chunk-parallel decode of that same single block via the sidecar
    side = stream_chunk_index(params, stream, chunk_samples=1024)
    out = decompress_long_stream(frame, side)
    assert np.array_equal(out, stream)
    print(f"sidecar decode: {side.size} lanes round-trip the block")

    # --- pipelined batch decode --------------------------------------
    B, N, K = 8, 1024, 4
    bc = BatchCompressor(params, B, N)
    batches, origs = [], []
    for _ in range(K):
        f = ((1100 + rng.normal(0, 6, (B, N))).astype(np.int64)
             & 0xFFFF).astype(np.uint16)
        packed, sizes = bc.compress_frames_packed(f)
        origs.append(f)
        offs = np.concatenate(([0], np.cumsum(sizes)[:-1]))
        batches.append((packed, offs, sizes))

    bd = BatchDecompressor(params, B, N)
    staged = (bd.stage_frames_at(s, o, z) for s, o, z in batches)
    for k, decoded in enumerate(bd.decompress_stream(staged)):
        assert np.array_equal(decoded, origs[k])
    print(f"pipelined decode: {K} packed batches round-trip "
          f"(checksums verified, staging overlapped)")

    # --- device-staged file decode -----------------------------------
    # One whole-file manifest: the compressed stream uploads ONCE, the
    # host parses ~30 bytes of header per frame, and grouped fused
    # dispatches gather/align the rows on device (the fastest sustained
    # public decode path).
    file_stream = b"".join(b[0] for b in batches)
    all_lens = np.concatenate([b[2] for b in batches])
    all_offs = np.concatenate(([0], np.cumsum(all_lens)[:-1]))
    bd2 = BatchDecompressor(params, B, N)
    for k, decoded in enumerate(
            bd2.decompress_file_stream(file_stream, all_offs, all_lens)):
        assert np.array_equal(decoded, origs[k])
    print(f"device-staged file decode: {K} windows round-trip "
          f"(stream resident on device, grouped launches)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
