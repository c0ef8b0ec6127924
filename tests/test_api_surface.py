"""Public API surface: sat_tpu exposes the framework's main entry points
lazily (importing the package must not initialize jax)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

import sat_tpu


def test_all_exports_resolve():
    for name in sat_tpu.__all__:
        assert getattr(sat_tpu, name) is not None, name
    assert sat_tpu.__version__


def test_unknown_attribute_raises():
    try:
        sat_tpu.not_a_thing
        assert False, "expected AttributeError"
    except AttributeError:
        pass


def test_package_import_is_jax_free():
    # fresh interpreter: importing sat_tpu must not pull in jax (lazy API)
    code = ("import sys, sat_tpu; "
            "sys.exit(1 if 'jax' in sys.modules else 0)")
    r = subprocess.run([sys.executable, "-c", code],
                       env={"PYTHONPATH": REPO, "PATH": "/usr/bin:/bin",
                            "HOME": "/root"}, timeout=120)
    assert r.returncode == 0, "importing sat_tpu initialized jax"
