"""`geotrax` umbrella CLI: maps subcommands to stage modules with lazy imports.

Surface parity with reference geotrax/cli.py:49-96 — seven subcommands
(batch, extract, georeference, aggregate, visualize, plot, config), lazy
module import so `--help` stays fast, `-V/--version`, and argv rewriting so
each stage module keeps its own argparse.
"""

from __future__ import annotations

import importlib
import sys

from geotrax_tpu import __version__

# subcommand -> (module path, one-line help)
COMMANDS = {
    "batch": ("geotrax_tpu.pipeline.batch", "Run the full pipeline over a video or a directory tree"),
    "extract": ("geotrax_tpu.pipeline.extract", "Detect, track and stabilize vehicle trajectories (pixel coords)"),
    "georeference": ("geotrax_tpu.pipeline.georeference", "Map extracted tracks to WGS84 + local CRS with kinematics"),
    "aggregate": ("geotrax_tpu.pipeline.aggregate", "Merge per-video georeferenced CSVs across drones/sessions"),
    "visualize": ("geotrax_tpu.pipeline.visualize", "Render annotated videos (5 modes incl. oriented boxes)"),
    "plot": ("geotrax_tpu.pipeline.plot", "Generate trajectory / kinematics / class-distribution plots"),
    "config": ("geotrax_tpu.pipeline.config_cmd", "Show or copy the bundled configuration presets"),
}

PROG = "geotrax"


def build_usage() -> str:
    lines = [
        f"usage: {PROG} <command> [options]",
        "",
        "TPU-native georeferenced trajectory extraction from BEV drone video.",
        "",
        "commands:",
    ]
    width = max(len(name) for name in COMMANDS)
    for name, (_, help_text) in COMMANDS.items():
        lines.append(f"  {name:<{width}}  {help_text}")
    lines += [
        "",
        f"Run '{PROG} <command> --help' for command-specific options.",
        f"  -V, --version   show version and exit",
    ]
    return "\n".join(lines)


def _honor_jax_platforms() -> None:
    """Honor JAX_PLATFORMS from the environment (reference parity: the torch
    stack picks CPU/GPU from the environment). Some TPU images re-pin jax to
    their plugin via sitecustomize after env evaluation, so a user exporting
    JAX_PLATFORMS=cpu (CI, machines without an accelerator) would silently
    land on the accelerator path; jax.config.update is the override that
    sticks. Tools apply the same guard (tools/_common.py)."""
    import os

    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def _enable_persistent_compile_cache() -> None:
    """XLA programs for the fused 4K pipeline cost minutes to build on a
    small host; a campaign runs one process per video (reference scope: 20
    intersections x many clips). The persistent compilation cache makes that
    a one-time cost per deployment instead of per run. Opt out / relocate
    with GEOTRAX_JAX_CACHE=off|<dir> (the reference's torch stack gets the
    same effect from CUDA kernels being precompiled in the wheel)."""
    import os

    target = os.environ.get("GEOTRAX_JAX_CACHE", "")
    if target.lower() in ("off", "0", "none"):
        return
    if not target:
        target = os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "geotrax", "jax",
        )
    import jax

    jax.config.update("jax_compilation_cache_dir", target)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(build_usage())
        return 0
    if argv[0] in ("-V", "--version"):
        print(f"{PROG} {__version__}")
        return 0

    command = argv[0]
    if command not in COMMANDS:
        print(f"{PROG}: unknown command '{command}'\n", file=sys.stderr)
        print(build_usage(), file=sys.stderr)
        return 2

    module_path, _ = COMMANDS[command]
    _honor_jax_platforms()   # before the stage module first imports jax
    _enable_persistent_compile_cache()
    module = importlib.import_module(module_path)
    # Stage modules own their argparse; present them a clean argv.
    sys.argv = [f"{PROG} {command}"] + argv[1:]
    result = module.main()
    return int(result) if result is not None else 0


if __name__ == "__main__":
    sys.exit(main())
