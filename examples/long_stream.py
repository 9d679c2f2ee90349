"""Long-stream (context-parallel) walkthrough: ONE block across a mesh.

A single AIRSPACE block larger than one chip comfortably handles is
split along the sample axis over a device mesh
(`parallel/sp.compress_long_stream`): DIFF halos ride `ppermute`, bit
offsets come from an `all_gather` scan, and the COMPLETE frame (shard
spans merged + header words) is produced by one device program.  The
output is an ordinary AIRSPACE block, byte-identical to a single-device
encode (reference format: lib/cmp_header.h:19-31 caps one block at
2^24-1 original bytes).

Decode-side, Golomb streams are bit-serial inside a block — the price of
the format.  `stream_chunk_index` buys the parallelism back OUTSIDE the
format: a sidecar of per-chunk payload bit lengths (4 bytes per 1024
samples, ~0.2% of the data, derivable from the samples at any time)
lets `decompress_long_stream` start every chunk's cursor independently
and run them as lockstep decoder lanes — boundary-validated, checksum
verified.

Runs on any JAX backend; on CPU set
XLA_FLAGS=--xla_force_host_platform_device_count=4 to see a real mesh.
"""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

import airs_compression_tpu as act
from airs_compression_tpu.parallel.mesh import make_mesh
from airs_compression_tpu.parallel.sp import (
    LongStreamCompressor,
    compress_long_stream,
    decompress_long_stream,
    stream_chunk_index,
)


def main() -> None:
    n = 1 << 16  # one 128 KiB block (well under the 2^24-1 format cap)
    rng = np.random.default_rng(0)
    stream = ((1100 + rng.normal(0, 6, n)).astype(np.int64)
              & 0xFFFF).astype(np.uint16)

    params = act.CmpParams(
        primary_preprocessing=act.Preprocessing.DIFF,
        primary_encoder_type=act.EncoderType.GOLOMB_ZERO,
        primary_encoder_param=4,
        checksum_enabled=True,
    )

    mesh = make_mesh(min(4, len(jax.devices())), "sp")
    print(f"mesh: {mesh.devices.size} device(s)")

    # one huge block, sharded encode -> a single ordinary AIRSPACE frame
    frame = compress_long_stream(mesh, params, stream)
    print(f"encoded {stream.nbytes} B -> {len(frame)} B "
          f"({stream.nbytes / len(frame):.2f}x) as ONE block")

    # any conforming decoder reads it...
    decoded, hdrs = act.decompress(frame)
    assert np.array_equal(decoded, stream)
    print(f"host decode round-trips ({len(hdrs)} block)")

    # ...and the sidecar makes the device decode chunk-parallel
    sidecar = stream_chunk_index(params, stream, chunk_samples=1024)
    print(f"sidecar: {sidecar.size} chunk offsets "
          f"({4 * sidecar.size} B, {400 * sidecar.size / stream.nbytes:.2f}%"
          " of the data)")
    fast = decompress_long_stream(frame, sidecar)
    assert np.array_equal(fast, stream)
    print(f"chunk-parallel decode round-trips ({sidecar.size} lanes)")

    # multi-pass chains (secondary MODEL passes, fallback, identifiers)
    # work over long streams too
    chain_params = act.CmpParams(
        primary_preprocessing=act.Preprocessing.DIFF,
        primary_encoder_type=act.EncoderType.GOLOMB_ZERO,
        primary_encoder_param=4,
        secondary_iterations=3,
        secondary_preprocessing=act.Preprocessing.MODEL,
        secondary_encoder_type=act.EncoderType.GOLOMB_ZERO,
        secondary_encoder_param=2,
        model_rate=8,
    )
    lsc = LongStreamCompressor(mesh, chain_params)
    chain = b"".join(
        lsc.compress((stream + k) & np.uint16(0xFFFF)) for k in range(3))
    decoded, hdrs = act.decompress(chain)
    assert [h.sequence_number for h in hdrs] == [0, 1, 2]
    print(f"3-pass model chain round-trips "
          f"({len(chain)} B for {3 * stream.nbytes} B)")


if __name__ == "__main__":
    main()
