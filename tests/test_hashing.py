"""FarmHash fingerprint + bucket hashing tests.

Golden values below are pinned from this implementation (self-goldens): they
guard stability across platforms/refactors, which is the property the feature
pipeline requires (stable bucket ids across hosts and across the Python/C++
loaders).
"""

import numpy as np
import pytest

from rectpu.features.hashing import fingerprint64, fingerprint64_bytes, hash_bucket

# self-goldens: (input, fingerprint64)
GOLDENS_FILE = "tests/data/hash_goldens.txt"
# goldens captured from TensorFlow's tf.strings.to_hash_bucket_fast (mod 2^63-1):
# bit-exact Fingerprint64 parity with the reference's hash kernels
TF_GOLDENS_FILE = "tests/data/hash_goldens_tf.txt"


def test_fingerprint_deterministic():
    assert fingerprint64("196") == fingerprint64("196")
    assert fingerprint64("196") != fingerprint64("197")
    assert fingerprint64("") == fingerprint64_bytes(b"")


def test_all_length_branches():
    # exercise 0-16, 17-32, 33-64 and >64 byte branches
    seen = set()
    for n in [0, 1, 2, 3, 4, 7, 8, 9, 15, 16, 17, 31, 32, 33, 63, 64, 65, 100, 200, 300]:
        s = bytes((i * 7 + n) % 256 for i in range(n))
        h = fingerprint64_bytes(s)
        assert 0 <= h < (1 << 64)
        seen.add(h)
    assert len(seen) == 20  # no collisions among the probes


def test_bucket_range_and_distribution():
    vals = np.arange(0, 5000)
    buckets = hash_bucket(vals, 50)
    assert buckets.min() >= 0 and buckets.max() < 50
    counts = np.bincount(buckets, minlength=50)
    # roughly uniform: each bucket within 50% of the mean
    assert counts.min() > 0.5 * counts.mean()
    assert counts.max() < 1.5 * counts.mean()


def test_string_vs_int_hash_match():
    # int inputs are hashed via their decimal string (TF as_string semantics)
    ints = np.array([0, 1, 42, 196, 99999])
    strs = np.array([str(v) for v in ints])
    np.testing.assert_array_equal(hash_bucket(ints, 1000), hash_bucket(strs, 1000))


def test_self_goldens_stable(tmp_path):
    """Pin concrete fingerprints so refactors/platforms can't drift silently."""
    import pathlib

    cases = ["", "a", "F", "M", "196", "technician", "85711", "administrator",
             "x" * 17, "y" * 33, "z" * 65, "w" * 200]
    lines = [f"{c!r} {fingerprint64(c)}" for c in cases]
    golden_path = pathlib.Path(GOLDENS_FILE)
    if golden_path.exists():
        expected = golden_path.read_text().strip().splitlines()
        assert lines == expected
    else:
        golden_path.parent.mkdir(parents=True, exist_ok=True)
        golden_path.write_text("\n".join(lines) + "\n")
        pytest.skip("goldens written on first run")


def test_tf_verified_goldens():
    """Pinned values captured from tf.strings.to_hash_bucket_fast: our
    fingerprint64 % (2^63-1) must reproduce TF's bucket ids exactly."""
    import ast
    import pathlib

    lines = pathlib.Path(TF_GOLDENS_FILE).read_text().strip().splitlines()
    assert len(lines) == 13
    for line in lines:
        s_repr, expected = line.rsplit(" ", 1)
        s = ast.literal_eval(s_repr)
        assert fingerprint64(s) % (2**63 - 1) == int(expected), s_repr


def test_native_parity_if_built():
    """C++ library must match the Python implementation bit-for-bit."""
    from rectpu.io import native

    if not native.available():
        pytest.skip("native library not built")
    rng = np.random.default_rng(3)
    for n in [0, 1, 3, 5, 8, 13, 16, 17, 25, 32, 33, 50, 64, 65, 127, 200]:
        s = bytes(rng.integers(0, 256, size=n, dtype=np.uint8))
        assert native.fingerprint64(s) == fingerprint64_bytes(s), f"len={n}"
    ints = rng.integers(-(2**31), 2**31, size=1000)
    np.testing.assert_array_equal(native.hash_ints(ints, 997), hash_bucket(ints, 997))
    words = [f"word_{i}" for i in range(100)]
    np.testing.assert_array_equal(
        native.hash_strings(words, 53), hash_bucket(np.array(words), 53)
    )


def test_hash_strings_array_fixed_stride_matches():
    """The vectorized S-dtype C path == per-element paths (incl. the pad
    handling for mixed-length strings)."""
    import numpy as np
    import pytest

    from rectpu.io import native

    if not native.available():
        pytest.skip("native lib not built")
    vals = np.asarray(["", "a", "F", "technician/engineer", "85711",
                       "x" * 70, "zip00042"])
    fixed = native.hash_strings_array(np.asarray(vals, np.bytes_), 1000)
    listy = native.hash_strings(list(vals), 1000)
    np.testing.assert_array_equal(fixed, listy)

    from rectpu.features.hashing import fingerprint64

    want = np.asarray([fingerprint64(v) % 1000 for v in vals], np.int32)
    np.testing.assert_array_equal(fixed, want)
