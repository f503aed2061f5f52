"""Packaging surface: console-script entry points + plugin discovery.

The reference is an installable package whose ns-* scripts and
entry-point plugin registry (ref: nerfstudio/pyproject.toml:100-110,
plugins/registry.py:34-60) third parties rely on; these tests pin the
snt-* equivalents without requiring `pip install`.
"""
import sys
import textwrap

try:  # py311+
    import tomllib
except ImportError:  # pragma: no cover
    import tomli as tomllib

from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_console_scripts_resolve():
    pyproject = tomllib.loads((REPO / "pyproject.toml").read_text())
    scripts = pyproject["project"]["scripts"]
    expected = {
        "snt-train", "snt-eval", "snt-render", "snt-export",
        "snt-viewer", "snt-process-data", "snt-download-data",
    }
    assert expected <= set(scripts)
    import importlib

    for target in scripts.values():
        mod_name, func = target.split(":")
        mod = importlib.import_module(mod_name)
        assert callable(getattr(mod, func)), target


def test_plugin_discovery_from_entry_points(tmp_path, monkeypatch):
    """A dummy installed package registering soccernerfs_tpu.method_configs
    is discovered and merged into the registry."""
    # synthesize an installed distribution: module + dist-info on sys.path
    (tmp_path / "dummy_snt_plugin.py").write_text(textwrap.dedent("""
        import copy
        from soccernerfs_tpu.plugins import MethodSpecification
        from soccernerfs_tpu.configs.method_configs import method_configs

        _cfg = copy.deepcopy(method_configs["k-planes"])
        _cfg.method_name = "dummy-method"
        spec = MethodSpecification(config=_cfg, description="a test plugin")
    """))
    dist = tmp_path / "dummy_snt_plugin-0.1.dist-info"
    dist.mkdir()
    (dist / "METADATA").write_text(
        "Metadata-Version: 2.1\nName: dummy-snt-plugin\nVersion: 0.1\n"
    )
    (dist / "entry_points.txt").write_text(
        "[soccernerfs_tpu.method_configs]\n"
        "dummy-method = dummy_snt_plugin:spec\n"
    )
    (dist / "RECORD").write_text("")
    monkeypatch.syspath_prepend(str(tmp_path))

    from soccernerfs_tpu.plugins import discover_methods

    methods, descriptions = discover_methods()
    assert "dummy-method" in methods
    assert descriptions["dummy-method"] == "a test plugin"
    sys.modules.pop("dummy_snt_plugin", None)


def test_completions_install_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("HOME", str(tmp_path))
    from soccernerfs_tpu.scripts import completions as comp

    script = comp.install("bash", tmp_path / "completions")
    text = script.read_text()
    assert "snt-train" in text and "k-planes" in text and "blender-data" in text
    rc = tmp_path / ".bashrc"
    assert f"source {script}" in rc.read_text()
    # idempotent
    comp.install("bash", tmp_path / "completions")
    assert rc.read_text().count("source ") == 1
    comp.uninstall("bash")
    assert "source" not in rc.read_text()
