"""Docs-site drift checks: the documented surface must exist.

The reference ships a full docs tree (reference: docs/getting_started.md,
docs/user_guide/, docs/mkdocs.yml); these tests keep ours honest — every
CLI command documented, every relative link resolvable, and every Python
name shown in the API guide actually importable, so the site cannot rot
silently as the library evolves.
"""

from __future__ import annotations

import importlib
import pathlib
import re

DOCS = pathlib.Path(__file__).resolve().parent.parent / "docs"


def test_docs_tree_matches_mkdocs_nav():
    mk = (DOCS.parent / "mkdocs.yml").read_text()
    for rel in re.findall(r":\s*([\w/]+\.md)", mk):
        assert (DOCS / rel).is_file(), f"mkdocs nav references missing page {rel}"


def test_cli_reference_covers_every_command():
    from marketpipe_spark.cli import build_parser

    p = build_parser()
    subs = next(a for a in p._actions if hasattr(a, "choices") and a.choices)
    text = (DOCS / "user_guide" / "cli.md").read_text()
    missing = [name for name in subs.choices if name not in text]
    assert not missing, f"CLI commands absent from docs/user_guide/cli.md: {missing}"


def test_relative_links_resolve():
    for page in DOCS.rglob("*.md"):
        text = page.read_text()
        for target in re.findall(r"\]\(([^)#:]+\.md)", text):
            resolved = (page.parent / target).resolve()
            assert resolved.is_file(), f"{page.relative_to(DOCS)} links to missing {target}"


def test_python_api_guide_names_import():
    """Every `from marketpipe_spark... import a, b` line in the API guide
    must resolve — documented names that drift from the code fail here."""
    text = (DOCS / "user_guide" / "python_api.md").read_text()
    stmts = re.findall(
        r"^from (marketpipe_spark[\w.]*) import \(([^)]*)\)", text, re.MULTILINE
    ) + re.findall(r"^from (marketpipe_spark[\w.]*) import ([^(\n][^\n]*)", text, re.MULTILINE)
    assert stmts, "no import statements found in the API guide"
    for mod_name, names_blob in stmts:
        mod = importlib.import_module(mod_name)
        decommented = " ".join(
            line.split("#")[0] for line in names_blob.splitlines()
        )
        names = [
            n.strip().split(" as ")[0] for n in decommented.split(",") if n.strip()
        ]
        missing = [n for n in names if not hasattr(mod, n)]
        assert not missing, f"{mod_name} lacks documented names {missing}"
