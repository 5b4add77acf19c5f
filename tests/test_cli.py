"""CLI surface: import + argument parsing of every entry point."""

import pytest


@pytest.mark.parametrize("mod,extra", [
    ("infer_wedetect", ["--image", "x.jpg", "--text", "a,b"]),
    ("generate_proposal", ["--image", "x.jpg"]),
    ("test", ["--ann", "a.json", "--img-root", "r"]),
    ("eval_recall", ["--ann", "a.json", "--img-root", "r"]),
    ("extract_embedding", ["--ann", "a.json", "--img-root", "r"]),
    ("infer_wedetect_ref", ["--image", "x.jpg", "--query", "q"]),
    ("train", ["--ann", "a.json", "--img-root", "r"]),
    ("eval_odinw", ["--root", "r"]),
    ("serve_ref", ["--ref_checkpoint", "c", "--requests", "r.jsonl"]),
])
def test_cli_parses(mod, extra):
    import importlib

    m = importlib.import_module(f"wedetect_tpu.cli.{mod}")
    args = m.parse_args(extra)
    assert args is not None
