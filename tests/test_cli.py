"""CLI surface tests (mirrors reference tests/test_cli.py patterns:
subprocess help/version/unknown-command/exit codes)."""

import subprocess
import sys

import pytest


def run_cli(*args):
    return subprocess.run(
        [sys.executable, "-m", "geotrax_tpu", *args],
        capture_output=True,
        text=True,
        timeout=120,
    )


def test_help_lists_all_commands():
    result = run_cli("--help")
    assert result.returncode == 0
    for cmd in ("batch", "extract", "georeference", "aggregate", "visualize", "plot", "config"):
        assert cmd in result.stdout


def test_no_args_shows_usage():
    result = run_cli()
    assert result.returncode == 0
    assert "usage:" in result.stdout


def test_version():
    result = run_cli("--version")
    assert result.returncode == 0
    assert "geotrax" in result.stdout
    assert any(ch.isdigit() for ch in result.stdout)


def test_unknown_command_exit_code():
    result = run_cli("frobnicate")
    assert result.returncode == 2
    assert "unknown command" in result.stderr


def test_config_show_lists_presets():
    result = run_cli("config", "show")
    assert result.returncode == 0
    for preset in ("default", "confident", "lenient", "stable"):
        assert preset in result.stdout


def test_config_show_preset_prints_yaml():
    result = run_cli("config", "show", "default")
    assert result.returncode == 0
    assert "tracker:" in result.stdout
    assert "extraction:" in result.stdout


def test_config_copy(tmp_path):
    result = run_cli("config", "copy", "confident", "--dest", str(tmp_path))
    assert result.returncode == 0
    assert (tmp_path / "confident_copy.yaml").exists()


@pytest.mark.parametrize("cmd", ["extract", "georeference", "visualize", "plot", "aggregate", "batch"])
def test_stage_help(cmd):
    result = run_cli(cmd, "--help")
    assert result.returncode == 0
    assert "--cfg" in result.stdout or "usage" in result.stdout.lower()
