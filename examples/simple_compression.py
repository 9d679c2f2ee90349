"""Full API walkthrough, mirroring the reference example program
(reference examples/simple_compression.c:1-355): model-based two-pass
compression of detector frames, then — beyond the reference — decoding the
stream back and verifying it bit-exactly.

Run:  python examples/simple_compression.py
(also executed as a smoke test by the test suite, like the reference runs
its example via meson test, examples/meson.build:9)
"""

import numpy as np

import airs_compression_tpu as act


def main():
    # 1. Choose compression parameters (reference example lines ~60-90):
    #    first pass stores the frame with DIFF + Golomb-zero; subsequent
    #    passes subtract an adaptive model of previous frames.
    params = act.CmpParams(
        primary_preprocessing=act.Preprocessing.DIFF,
        primary_encoder_type=act.EncoderType.GOLOMB_ZERO,
        primary_encoder_param=2,
        secondary_iterations=10,
        secondary_preprocessing=act.Preprocessing.MODEL,
        secondary_encoder_type=act.EncoderType.GOLOMB_ZERO,
        secondary_encoder_param=1,
        model_rate=11,
        checksum_enabled=True,
    )

    # 2. Create a compression context (reference cmp_initialise; the work
    #    buffer the C API makes you size and allocate is managed for you).
    ctx = act.CmpContext(params)

    # 3. Compress a series of similar frames through the model chain.
    rng = np.random.default_rng(42)
    base = rng.integers(1000, 1100, 1024).astype(np.uint16)
    stream = b""
    frames = []
    for i in range(5):
        frame = (base + rng.integers(-5, 6, base.size)).astype(np.uint16)
        frames.append(frame)
        block = ctx.compress_u16(frame)
        stream += block
        print(f"frame {i}: {frame.nbytes} -> {len(block)} bytes "
              f"({frame.nbytes / len(block):.2f}x)")

    # 4. Decompress (the reference CLI prints "not implemented yet" here).
    decoded, headers = act.decompress(stream)
    expected = np.concatenate(frames)
    assert np.array_equal(decoded, expected), "round-trip mismatch!"
    print(f"\nround-trip OK: {len(stream)} compressed bytes -> "
          f"{decoded.size} samples across {len(headers)} blocks")
    print("sequence numbers:", [h.sequence_number for h in headers])

    # 5. Reset the context to start an independent series (cmp_reset).
    ctx.reset()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
