"""Unit tests for bench.py's host-calibration probes and validity-gate
logic (round 5): these run in every pytest pass so a probe regression is
caught before a driver bench run publishes inadmissible evidence."""

import sys

import bench


def test_run_calib_once_cpu_returns_rate():
    r = bench._run_calib_once("cpu", 50, 1)
    assert r is not None and r > 0


def test_run_calib_once_membw_small_returns_rate():
    r = bench._run_calib_once("membw", 1, 1)
    assert r is not None and r > 0


def test_calib_child_is_parent_main_independent():
    """The probe children are `python -c` subprocesses: they must work no
    matter how the parent was launched (an mp spawn context re-executes
    the parent's main module, which breaks under stdin/embedded runners).
    Simulate the hostile case by running the probe from a `python -`
    parent."""
    import subprocess

    code = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "import bench\n"
        "r = bench._run_calib_once('cpu', 20, 1)\n"
        "print('RATE_OK' if r and r > 0 else 'RATE_BAD')\n"
    )
    out = subprocess.run(
        [sys.executable, "-"], input=code, capture_output=True, text=True, timeout=120
    )
    assert "RATE_OK" in out.stdout, out.stderr[-500:]


def test_host_scaling_ceilings_skip_membw():
    c = bench.host_scaling_ceilings(spin_n=50, mem_n=1, skip_membw=True)
    assert c.get("host_membw_calib_skipped") is True
    assert "host_membw_calib_eff" not in c
    assert 0 < c["host_cpu_calib_eff"] <= 1.0


def test_binding_ceiling_uses_min_when_membw_valid():
    c = {"host_cpu_calib_eff": 0.95, "host_membw_calib_eff": 0.7}
    assert bench._binding_ceiling(c) == 0.7


def test_binding_ceiling_falls_back_to_cpu_on_probe_failure():
    """A synthetic 0.0 from a dead probe must not masquerade as a host
    measurement — r4's driver run published calib_clean_pairs=0 because
    it did."""
    failed = {
        "host_cpu_calib_eff": 0.97,
        "host_membw_calib_eff": 0.0,
        "host_membw_calib_failed": True,
    }
    assert bench._binding_ceiling(failed) == 0.97
    skipped = {"host_cpu_calib_eff": 0.9, "host_membw_calib_skipped": True}
    assert bench._binding_ceiling(skipped) == 0.9


def test_read_line_deadline_times_out():
    import os
    import time

    r, w = os.pipe()
    try:
        t0 = time.time()
        assert bench._read_line_deadline(r, time.time() + 0.3) is None
        assert time.time() - t0 < 2.0
    finally:
        os.close(r)
        os.close(w)


def test_read_line_deadline_reads_message():
    import os

    r, w = os.pipe()
    try:
        os.write(w, b"12345.0\n")
        import time

        msg = bench._read_line_deadline(r, time.time() + 5)
        assert msg is not None and float(msg) == 12345.0
    finally:
        os.close(r)
        os.close(w)
