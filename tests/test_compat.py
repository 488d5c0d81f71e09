"""compat.ensure_protobuf — the TWS runtime-dependency shim.

Each scenario runs in a SUBPROCESS because the shim's whole job is
mutating import state (sys.modules aliasing, validator patching); doing
that in the shared pytest interpreter would leak between tests.
"""

import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, "-c", textwrap.dedent(code)],
        capture_output=True,
        text=True,
        timeout=120,
        env=env,
    )


def _shim_available() -> bool:
    from dissertation_data_pipeline_spark.compat import ensure_protobuf

    return ensure_protobuf()


needs_shim = pytest.mark.skipif(
    not _shim_available(), reason="no protobuf runtime reachable on this host"
)


@needs_shim
def test_ensure_protobuf_yields_file_backed_package_and_gencode():
    r = _run(
        """
        import sys
        from dissertation_data_pipeline_spark.compat import ensure_protobuf
        assert ensure_protobuf() is True
        assert ensure_protobuf() is True  # memoized, idempotent
        import google.protobuf as gp
        assert gp.__file__ is not None, "namespace portion, not a real install"
        import pyspark.sql.streaming.proto.StateMessage_pb2 as sm
        m = sm.StateRequest(); m.version = 2
        out = sm.StateRequest(); out.ParseFromString(m.SerializeToString())
        assert out.version == 2
        print("OK")
        """
    )
    assert r.returncode == 0, r.stderr
    assert "OK" in r.stdout


@needs_shim
def test_ensure_protobuf_displaces_jar_namespace_portion():
    """Spark workers see `google/protobuf/*.proto` RESOURCES inside
    spark-core's jar on sys.path, so a bare import succeeds as an empty
    namespace package — the exact failure mode of the first TWS run.
    Simulate it with a dir-based namespace portion and assert the shim
    swaps in the file-backed runtime anyway."""
    r = _run(
        """
        import os, sys, tempfile
        fake = tempfile.mkdtemp()
        os.makedirs(os.path.join(fake, "google", "protobuf"))
        sys.path.insert(0, fake)
        import google.protobuf as gp
        assert getattr(gp, "__file__", None) is None  # namespace portion
        from dissertation_data_pipeline_spark.compat import ensure_protobuf
        assert ensure_protobuf() is True
        import google.protobuf as gp2
        assert gp2.__file__ is not None
        from google.protobuf import descriptor  # the import that failed live
        print("OK")
        """
    )
    assert r.returncode == 0, r.stderr
    assert "OK" in r.stdout


def test_ensure_protobuf_false_leaves_no_residue_when_unavailable():
    """With candidates pointed nowhere (env override to an empty dir and
    the SDK path hidden by it NOT being consulted first — we simulate by
    overriding HOME of the search: a bogus SPARK_GRAFT_PROTOBUF_DIR plus
    a patched candidate list), a failed probe must leave sys.modules
    clean so pyspark's own error surfaces, not a half-aliased one."""
    r = _run(
        """
        import sys
        import dissertation_data_pipeline_spark.compat as compat
        compat._candidate_google_dirs = lambda: iter(["/nonexistent-x"])
        assert compat.ensure_protobuf() is False
        assert compat.ensure_protobuf() is False  # memoized
        assert "google.protobuf" not in sys.modules or \
            getattr(sys.modules["google.protobuf"], "__file__", None) is None
        print("OK")
        """
    )
    assert r.returncode == 0, r.stderr
    assert "OK" in r.stdout


@needs_shim
def test_installed_but_broken_runtime_falls_through_to_candidates():
    """ADVICE r8: an installed-but-incompatible protobuf (wrong major,
    or broken — anything whose gencode won't load) must not defeat the
    shim.  Simulate with a file-backed but empty `google.protobuf`
    package shadowing the candidates on sys.path: ensure_protobuf must
    fall through to the candidate-dir loop and alias a working copy
    AHEAD of the bad install."""
    r = _run(
        """
        import os, sys, tempfile
        fake = tempfile.mkdtemp()
        pkg = os.path.join(fake, "google", "protobuf")
        os.makedirs(pkg)
        open(os.path.join(fake, "google", "__init__.py"), "w").write("")
        open(os.path.join(pkg, "__init__.py"), "w").write("")
        sys.path.insert(0, fake)
        import google.protobuf as gp
        assert gp.__file__ is not None  # looks INSTALLED, is broken
        from dissertation_data_pipeline_spark.compat import ensure_protobuf
        assert ensure_protobuf() is True, "fall-through did not engage"
        import pyspark.sql.streaming.proto.StateMessage_pb2 as sm
        m = sm.StateRequest(); m.version = 2
        out = sm.StateRequest(); out.ParseFromString(m.SerializeToString())
        assert out.version == 2
        print("OK")
        """
    )
    assert r.returncode == 0, r.stderr
    assert "OK" in r.stdout


@needs_shim
def test_lenient_validator_still_rejects_major_mismatch():
    r = _run(
        """
        from dissertation_data_pipeline_spark.compat import ensure_protobuf
        assert ensure_protobuf()
        from google.protobuf import runtime_version as rv
        # same major, newer minor: tolerated
        rv.ValidateProtobufRuntimeVersion(
            rv.Domain.PUBLIC, rv.MAJOR, rv.MINOR + 1, 0, "", "x.proto")
        # different major: still refused
        try:
            rv.ValidateProtobufRuntimeVersion(
                rv.Domain.PUBLIC, rv.MAJOR + 1, 0, 0, "", "x.proto")
        except rv.VersionError:
            print("OK")
        else:
            raise AssertionError("major-version mismatch was not rejected")
        """
    )
    assert r.returncode == 0, r.stderr
    assert "OK" in r.stdout
