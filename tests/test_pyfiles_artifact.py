"""The --py-files zip must be a COMPLETE deployable package: data tables
(cpc_tables.npz, psl_table.npz) ride along and their loaders read through
importlib.resources, so imports work from inside the zip exactly as from
the source tree (executors on a real cluster only ever see the zip)."""

import os
import subprocess
import sys
import zipfile


def test_zip_contains_data_tables_and_loads_from_zip(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import make_pyfiles as MP

    out = str(tmp_path / "dsps.zip")
    members = MP.build(out)
    names = set(members)
    assert "datasketches_postgresql_spark/sketches/cpc_tables.npz" in names
    assert "datasketches_postgresql_spark/textops/psl_table.npz" in names
    with zipfile.ZipFile(out) as zf:
        assert set(zf.namelist()) == names
    # import FROM THE ZIP in a clean interpreter and load both tables +
    # run a CPC roundtrip (the per-executor path on a cluster)
    probe = (
        "import sys; sys.path.insert(0, sys.argv[1])\n"
        "import numpy as np\n"
        "from datasketches_postgresql_spark.sketches import cpc_interop as CI\n"
        "from datasketches_postgresql_spark.textops.urlops import _psl\n"
        "sk = CI.build_murmur(np.arange(500, dtype=np.uint64), 11)\n"
        "img = CI.serialize_canonical(sk)\n"
        "assert CI.serialize_canonical(CI.deserialize_canonical(img)) == img\n"
        "assert 'github.io' in _psl()['exact_2']\n"
        "print('ZIP_OK')\n"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = ""  # the zip must be self-sufficient for the package
    r = subprocess.run(
        [sys.executable, "-c", probe, out],
        capture_output=True, text=True, env=env,
        cwd=str(tmp_path),  # not the repo root: no source-tree fallback
    )
    assert r.returncode == 0, r.stderr
    assert "ZIP_OK" in r.stdout
