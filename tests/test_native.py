"""Native IO runtime tests: C++ text-matrix parser vs numpy oracle, binary
snapshot log roundtrip (native and fallback paths)."""

import numpy as np
import pytest

from soft_robot_control_tpu.utils import native


def test_native_library_builds():
    assert native.native_available(), "g++ build of csrc/srk_io.cpp failed"


def test_parse_matrix_txt_matches_numpy(tmp_path):
    rng = np.random.default_rng(0)
    M = rng.normal(size=(40, 37))
    path = tmp_path / "mat.txt"
    # SOFA-LDL-style format: a header line, then bracketed rows
    with open(path, "w") as f:
        f.write("# header to skip\n")
        for row in M:
            f.write("[" + " ".join(f"{v:.12g}" for v in row) + "]\n")
    out = native.parse_matrix_txt(str(path), 40, 37, skip_lines=1)
    np.testing.assert_allclose(out, M, rtol=1e-10)


def test_parse_matrix_txt_plain_whitespace(tmp_path):
    rng = np.random.default_rng(1)
    M = rng.normal(size=(12, 5))
    path = tmp_path / "mat2.txt"
    np.savetxt(path, M)
    out = native.parse_matrix_txt(str(path), 12, 5)
    np.testing.assert_allclose(out, M, rtol=1e-10)


def test_snaplog_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    width = 9
    recs = rng.normal(size=(123, width))
    path = str(tmp_path / "log.snap")
    with native.SnapLog(path, width) as log:
        for r in recs[:23]:
            log.append(r)
        log.append_many(recs[23:])
    back = native.read_snaplog(path)
    np.testing.assert_allclose(back, recs, atol=0)


def test_snaplog_width_mismatch(tmp_path):
    path = str(tmp_path / "log2.snap")
    log = native.SnapLog(path, 4)
    with pytest.raises(ValueError):
        log.append(np.zeros(5))
    log.close()
