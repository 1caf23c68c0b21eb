"""Jupyter notebook extraction (llm/notebook.py)."""

import json

import pytest

from meza_spark.llm.doctext import extract_document_bytes
from meza_spark.llm.notebook import (MAX_NB_BYTES, encode_ipynb,
                                     extract_ipynb_bytes)


def test_markdown_stripped_code_verbatim():
    b = encode_ipynb([
        ("markdown", "# Title\n\nSome **bold** [text](http://x)"),
        ("code", "def f(x):\n    return x ** 2  # comment"),
    ])
    r = extract_ipynb_bytes(b)
    assert r["text"] == ("Title\n\nSome bold text\n\n"
                         "def f(x):\n    return x ** 2  # comment")
    assert r["n_parts"] == 2 and r["n_code_cells"] == 1
    assert r["language"] == "python"


def test_outputs_dropped_and_empty_cells_skipped():
    doc = json.loads(encode_ipynb([("code", "print(1)"), ("code", "")]))
    doc["cells"][0]["outputs"] = [
        {"output_type": "stream", "text": ["NOT training data\n"]}]
    r = extract_ipynb_bytes(json.dumps(doc).encode())
    assert r["text"] == "print(1)"
    assert r["n_parts"] == 2 and r["n_code_cells"] == 2


def test_raw_cells_pass_through():
    r = extract_ipynb_bytes(encode_ipynb([("raw", "raw content")]))
    assert r["text"] == "raw content"


def test_source_as_single_string():
    doc = {"cells": [{"cell_type": "code", "metadata": {},
                      "outputs": [], "execution_count": None,
                      "source": "x = 1"}],
           "metadata": {}, "nbformat": 4, "nbformat_minor": 5}
    r = extract_ipynb_bytes(json.dumps(doc).encode())
    assert r["text"] == "x = 1" and r["language"] is None


def test_kernelspec_language_fallback():
    doc = json.loads(encode_ipynb([("code", "x")]))
    doc["metadata"] = {"kernelspec": {"language": "julia", "name": "j"}}
    assert extract_ipynb_bytes(json.dumps(doc).encode())["language"] == "julia"


def test_hostiles():
    with pytest.raises(ValueError, match="empty"):
        extract_ipynb_bytes(b"")
    with pytest.raises(ValueError, match="not JSON"):
        extract_ipynb_bytes(b"{broken")
    with pytest.raises(ValueError, match="root is not an object"):
        extract_ipynb_bytes(b"[1,2]")
    with pytest.raises(ValueError, match="v3"):
        extract_ipynb_bytes(b'{"worksheets": [], "nbformat": 3}')
    with pytest.raises(ValueError, match="missing cells"):
        extract_ipynb_bytes(b'{"cells": [], "nbformat": "4"}')
    with pytest.raises(ValueError, match="byte budget"):
        extract_ipynb_bytes(b"{" + b" " * MAX_NB_BYTES + b"}")
    # hostile cell shapes never crash
    doc = {"cells": [1, None, {"cell_type": "code", "source": 7},
                     {"cell_type": "weird", "source": "x"}],
           "nbformat": 4}
    assert extract_ipynb_bytes(json.dumps(doc).encode())["text"] == ""


def test_cell_count_bomb():
    b = (b'{"nbformat": 4, "cells": ['
         + b",".join(b'{"cell_type":"raw","source":""}'
                     for _ in range(50_001)) + b"]}")
    with pytest.raises(ValueError, match="cell count"):
        extract_ipynb_bytes(b)


# -------------------------------------------------------- doctext route

def test_doctext_routes_ipynb():
    b = encode_ipynb([("markdown", "# H"), ("code", "y = 2")])
    r = extract_document_bytes(b)
    assert (r["format"], r["text"], r["n_parts"]) == ("ipynb", "H\n\ny = 2", 2)


def test_doctext_plain_json_stays_txt():
    assert extract_document_bytes(
        b'{"cells": "no", "nbformat": "not-int"}')["format"] == "txt"
    assert extract_document_bytes(
        b'{"key": "value, no notebook markers"}')["format"] == "txt"
