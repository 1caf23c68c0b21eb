"""Jupyter notebook (.ipynb) → plain text — notebooks are a
first-class CODE-corpus format (the dominant container for
data-science source on public hosting). Pure stdlib: the container
is JSON (nbformat v4), markdown cells route through
:mod:`meza_spark.llm.markup`'s CommonMark-core stripper, code cells
pass VERBATIM (code is the training signal — never reflowed), and
cell OUTPUTS are deliberately dropped (execution artifacts, not
authored content; the policy a curation pipeline wants by default).

nbformat v3 (``worksheets``) and non-notebook JSON raise
``ValueError`` — honest gates, the dispatcher falls back to 'txt'.
"""

from __future__ import annotations

import json

MAX_NB_BYTES = 128 * 1024 * 1024
MAX_NB_CELLS = 50_000


def _cell_source(cell: dict) -> str:
    src = cell.get("source", "")
    if isinstance(src, list):
        src = "".join(s for s in src if isinstance(s, str))
    return src if isinstance(src, str) else ""


def extract_ipynb_bytes(b: bytes) -> dict:
    """One notebook → {format, text, title, n_parts, n_code_cells,
    language}. Raises ValueError for non-notebook payloads."""
    if not b:
        raise ValueError("empty payload")
    if len(b) > MAX_NB_BYTES:
        raise ValueError("notebook exceeds the byte budget")
    try:
        nb = json.loads(b.decode("utf-8", "replace"))
    except (json.JSONDecodeError, RecursionError) as e:
        raise ValueError(f"not JSON: {e}") from None
    if not isinstance(nb, dict):
        raise ValueError("not a notebook: JSON root is not an object")
    if "worksheets" in nb and "cells" not in nb:
        raise ValueError("nbformat v3 (worksheets) is not supported")
    cells = nb.get("cells")
    fmt = nb.get("nbformat")
    if not isinstance(cells, list) or not isinstance(fmt, int) or fmt < 4:
        raise ValueError("not a notebook: missing cells/nbformat>=4")
    if len(cells) > MAX_NB_CELLS:
        raise ValueError("notebook cell count exceeds the budget")
    from meza_spark.llm.markup import markdown_to_text

    parts = []
    n_code = 0
    for cell in cells:
        if not isinstance(cell, dict):
            continue
        ctype = cell.get("cell_type")
        src = _cell_source(cell)
        if ctype == "markdown":
            txt = markdown_to_text(src)
        elif ctype == "code":
            n_code += 1
            txt = src.strip("\n")
        elif ctype == "raw":
            txt = src.strip("\n")
        else:
            continue
        if txt.strip():
            parts.append(txt)
    lang = None
    meta = nb.get("metadata")
    if isinstance(meta, dict):
        ks = meta.get("kernelspec")
        li = meta.get("language_info")
        if isinstance(li, dict) and isinstance(li.get("name"), str):
            lang = li["name"]
        elif isinstance(ks, dict) and isinstance(ks.get("language"), str):
            lang = ks["language"]
    return {"format": "ipynb", "text": "\n\n".join(parts),
            "title": None, "n_parts": len(cells),
            "n_code_cells": n_code, "language": lang}


def encode_ipynb(cells, language: str = "python") -> bytes:
    """Deterministic nbformat-v4 fixture: ``cells`` is a list of
    (cell_type, source-str) pairs; sorted keys, no execution state."""
    doc = {
        "cells": [
            {"cell_type": ct, "metadata": {},
             "source": src.splitlines(keepends=True),
             **({"outputs": [], "execution_count": None}
                if ct == "code" else {})}
            for ct, src in cells],
        "metadata": {"language_info": {"name": language}},
        "nbformat": 4, "nbformat_minor": 5,
    }
    return json.dumps(doc, sort_keys=True,
                      separators=(",", ":")).encode("utf-8")
