"""Native (C++) CSV loader parity vs the pandas path, including RFC-4180 quoting."""

import numpy as np
import pytest

from rectpu.features.schema import ml_100k_feature_set

try:
    from rectpu.io import native

    HAVE_NATIVE = native.available()
except Exception:
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE, reason="native library not built")


def test_full_parity_on_synthetic(synthetic_dir):
    from rectpu.io.loader import CsvDataset

    fs = ml_100k_feature_set()
    py = CsvDataset(synthetic_dir["train"], fs, use_native=False)
    cc = CsvDataset(synthetic_dir["train"], fs, use_native=True)
    assert cc.size == py.size
    np.testing.assert_array_equal(cc.cat_ids, py.cat_ids)
    np.testing.assert_array_equal(cc.labels, py.labels)


def test_numeric_columns_parity(synthetic_dir):
    from rectpu.io.loader import CsvDataset

    fs = ml_100k_feature_set(numeric=("age", "release_year"))
    py = CsvDataset(synthetic_dir["test"], fs, use_native=False)
    cc = CsvDataset(synthetic_dir["test"], fs, use_native=True)
    np.testing.assert_array_equal(cc.cat_ids, py.cat_ids)
    np.testing.assert_allclose(cc.num_vals, py.num_vals, rtol=1e-6)


def test_quoted_fields_and_defaults(tmp_path):
    """Commas inside quoted titles (real ml-100k has them), empty fields ->
    defaults, escaped quotes."""
    csv = tmp_path / "q.csv"
    csv.write_text(
        "user_id,item_id,rating,age,gender,occupation,zipcode,release_year,title,action\n"
        '1,2,5,30,F,student,85711,1994,"Movie, The (1994)",1\n'
        '3,4,2,,M,"say ""hi""",,1950,plain,0\n'
        "5,6,4,45,,engineer,00000,,x,1\n"
    )
    from rectpu.io.loader import CsvDataset

    fs = ml_100k_feature_set()
    py = CsvDataset(csv, fs, use_native=False)
    cc = CsvDataset(csv, fs, use_native=True)
    assert cc.size == 3
    np.testing.assert_array_equal(cc.cat_ids, py.cat_ids)
    np.testing.assert_array_equal(cc.labels, py.labels)
    # label = rating >= 5
    np.testing.assert_array_equal(cc.labels, [1.0, 0.0, 0.0])
    offs = fs.offsets
    # row 1: age empty -> default 0 -> bucket 0; gender M -> 1
    assert cc.cat_ids[1, 2] - offs[2] == 0
    assert cc.cat_ids[1, 3] - offs[3] == 1
    # row 2: gender empty -> "null" -> OOV bucket 2
    assert cc.cat_ids[2, 3] - offs[3] == 2


def test_native_is_fast(synthetic_dir):
    """Parse+encode throughput sanity: native beats pandas path."""
    import time

    from rectpu.io.loader import CsvDataset

    fs = ml_100k_feature_set()
    t0 = time.time()
    CsvDataset(synthetic_dir["train"], fs, use_native=True)
    t_native = time.time() - t0
    t0 = time.time()
    CsvDataset(synthetic_dir["train"], fs, use_native=False)
    t_py = time.time() - t0
    # don't be strict on small files; just catch pathological regressions
    assert t_native < max(t_py * 2.0, 1.0), (t_native, t_py)
