"""Markdown and LaTeX → plain text (the two markup families that
dominate code-adjacent and scientific crawl corpora — GitHub READMEs
and arXiv sources; same normative-subset charter as the jusText-lite
HTML extractor: a documented, deterministic transform, not a
renderer).

**Markdown** (``markdown_to_text``) — line-oriented scanner over the
CommonMark core constructs:

* fenced code blocks: the ``\\u0060\\u0060\\u0060``/``~~~`` delimiter
  lines drop, the code lines survive verbatim (no inline processing);
* per-line block markers strip: ATX ``#`` headings, ``>`` quotes
  (nested), list bullets ``-``/``*``/``+`` and ordered ``N.``/``N)``,
  setext underlines and thematic breaks drop;
* inline transforms: images ``![alt](url)`` → alt, links
  ``[text](url)``/``[text][ref]`` → text, autolinks ``<http://x>`` →
  url, code spans unwrap, ``**``/``__``/``*``/``_``/``~~`` emphasis
  unwraps, HTML tags drop, backslash escapes unescape;
* reference-definition lines (``[id]: url``) drop; trailing
  whitespace trims; blank runs collapse to one; edges trim.

**LaTeX** (``latex_to_text``) — single-pass scanner:

* ``%`` comments to EOL (``\\%`` stays a literal percent);
* preamble dropped when ``\\begin{document}`` exists;
* math dropped: ``$...$``, ``$$...$$``, ``\\(..\\)``, ``\\[..\\]`` and
  equation/align/displaymath/math/eqnarray/gather environments;
* argument-KEEPING commands unwrap (section*/emph/textbf/…, with
  sectioning adding line breaks); argument-DROPPING commands vanish
  with their braced/bracketed args (label/cite/ref/usepackage/…);
  unknown commands drop, their brace groups stay transparent;
* escapes ``\\% \\& \\$ \\# \\_ \\{ \\}`` → literals, ``~`` → space,
  ``\\\\`` → newline, ``--``/``---`` pass through untouched;
* same blank-run collapse + edge trim as the Markdown side.

Both are row-local Arrow ``pandas_udf`` wrappers at the Spark layer
(strings in, strings out — zero shuffle, the content-tier scale
shape).
"""

from __future__ import annotations

import re

import pandas as pd

# ------------------------------------------------------------- markdown

_FENCE_RE = re.compile(r"^( {0,3})(```+|~~~+)\s*\S*\s*$")
_HR_RE = re.compile(r"^ {0,3}([-*_])( *\1){2,} *$")
_SETEXT_RE = re.compile(r"^ {0,3}(=+|-+) *$")
_REFDEF_RE = re.compile(r"^ {0,3}\[[^\]]+\]:\s+\S+")
_BLOCK_RE = re.compile(r"^( {0,3})(?:(#{1,6})\s+|(>\s?)+|([-*+])\s+"
                       r"|(\d{1,9})[.)]\s+)")
_IMG_RE = re.compile(r"!\[([^\]]*)\]\([^)]*\)")
_LINK_RE = re.compile(r"\[([^\]]*)\]\((?:[^()]|\([^()]*\))*\)")
_REFLINK_RE = re.compile(r"\[([^\]]*)\]\[[^\]]*\]")
_AUTO_RE = re.compile(r"<(https?://[^ >]+)>")
_CODESPAN_RE = re.compile(r"(`+)(.+?)\1")
_TAG_RE = re.compile(r"</?[A-Za-z][^>]*>")
_EMPH_RE = re.compile(r"(\*\*|__|~~)(?=\S)(.+?)(?<=\S)\1")
_EMPH1_RE = re.compile(r"([*_])(?=\S)([^*_]+?)(?<=\S)\1")
_MDESC_RE = re.compile(r"\\([\\`*_{}\[\]()#+.!><~|-])")


def _md_inline(s: str) -> str:
    # hide backslash-escaped characters from every inline pass behind
    # a private-use sentinel + hex code, decoded at the end
    s = _MDESC_RE.sub(lambda m: "" + format(ord(m.group(1)), "02x"), s)
    s = _CODESPAN_RE.sub(lambda m: m.group(2), s)
    s = _IMG_RE.sub(lambda m: m.group(1), s)
    s = _LINK_RE.sub(lambda m: m.group(1), s)
    s = _REFLINK_RE.sub(lambda m: m.group(1), s)
    s = _AUTO_RE.sub(lambda m: m.group(1), s)
    s = _TAG_RE.sub("", s)
    for _ in range(3):                       # nested ***bold italic***
        s2 = _EMPH_RE.sub(lambda m: m.group(2), s)
        s2 = _EMPH1_RE.sub(lambda m: m.group(2), s2)
        if s2 == s:
            break
        s = s2
    return re.sub("([0-9a-f]{2})",
                  lambda m: chr(int(m.group(1), 16)), s)


_MD_SPECIAL = frozenset("\\`*_{}[]()#+.!><~|-")


def md_escape(s: str) -> str:
    """Escape plain text for embedding in a Markdown fixture such
    that ``markdown_to_text`` restores it exactly (modulo the
    documented normalization: per-line trailing-space trim, blank-run
    collapse, edge trim). Every CommonMark-escapable construct is
    covered; the one non-escapable edge is a line consisting solely
    of ``=`` (a setext underline — CommonMark itself provides no
    escape for ``=``), which survives only when not preceded by a
    text line."""
    return "\n".join(
        "".join("\\" + c if c in _MD_SPECIAL else c for c in line)
        for line in (s or "").split("\n"))


def markdown_to_text(md: str) -> str:
    out: list[str] = []
    fence: str | None = None
    prev_text = False
    for raw in (md or "").split("\n"):
        line = raw.rstrip()
        m = _FENCE_RE.match(line)
        if m:
            if fence is None:
                fence = m.group(2)[0]
            elif m.group(2)[0] == fence:
                fence = None
            else:
                out.append(line)             # other fence char: code
            continue
        if fence is not None:
            out.append(raw.rstrip())         # code survives verbatim
            continue
        if _HR_RE.match(line) or _REFDEF_RE.match(line):
            continue
        if prev_text and _SETEXT_RE.match(line):
            continue                          # heading underline
        stripped = line
        while True:                           # peel nested block marks
            m = _BLOCK_RE.match(stripped)
            if not m or not m.group(0):
                break
            stripped = stripped[m.end():]
        out.append(_md_inline(stripped).rstrip())
        prev_text = bool(stripped.strip())
    text = "\n".join(out)
    text = re.sub(r"\n{3,}", "\n\n", text)
    return text.strip("\n")


# --------------------------------------------------------------- latex

# commands whose FIRST brace group is kept as text; sectioning also
# breaks the line around the title
_TEX_KEEP = frozenset((
    "emph", "textbf", "textit", "texttt", "textsc", "textsf",
    "textrm", "textsl", "underline", "mbox", "fbox", "text",
    "textsuperscript", "textsubscript", "caption", "title", "author",
))
_TEX_SECT = frozenset((
    "part", "chapter", "section", "subsection", "subsubsection",
    "paragraph", "subparagraph",
))
# commands that vanish WITH their argument groups
_TEX_DROP = frozenset((
    "label", "ref", "eqref", "pageref", "cite", "citep", "citet",
    "usepackage", "documentclass", "bibliography",
    "bibliographystyle", "includegraphics", "input", "include",
    "vspace", "hspace", "setlength", "newcommand", "renewcommand",
    "def", "url",           # href is handled specially (keeps arg 2)
))
# commands that ARE a character
_TEX_SYMBOL = {"textbackslash": "\\", "textasciitilde": "~",
               "textasciicircum": "^", "ldots": "...",
               "dots": "...", "LaTeX": "LaTeX", "TeX": "TeX"}
_MATH_ENVS = frozenset((
    "equation", "equation*", "align", "align*", "displaymath",
    "math", "eqnarray", "eqnarray*", "gather", "gather*",
    "multline", "multline*",
))
_TEX_CMD_RE = re.compile(r"[A-Za-z]+\*?")


def _skip_group(s: str, i: int, open_ch: str, close_ch: str) -> int:
    """i points AT open_ch; return index past the matching close."""
    depth = 0
    n = len(s)
    while i < n:
        c = s[i]
        if c == "\\":
            i += 2
            continue
        if c == open_ch:
            depth += 1
        elif c == close_ch:
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    return n


def latex_to_text(tex: str) -> str:
    tex = tex or ""
    # strip % comments (keeping \%), line by line
    lines = []
    for line in tex.split("\n"):
        buf = []
        j = 0
        while j < len(line):
            c = line[j]
            if c == "\\" and j + 1 < len(line):
                buf.append(line[j:j + 2])
                j += 2
                continue
            if c == "%":
                break
            buf.append(c)
            j += 1
        lines.append("".join(buf))
    s = "\n".join(lines)
    m = re.search(r"\\begin\{document\}", s)
    if m:
        end = re.search(r"\\end\{document\}", s)
        s = s[m.end():end.start() if end else len(s)]

    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "\\":
            nx = s[i + 1:i + 2]
            if nx in "%&$#_{}":
                out.append(nx)
                i += 2
            elif nx == "\\":
                out.append("\n")
                i += 2
                # swallow an optional [len] spacing arg
                if s[i:i + 1] == "[":
                    i = _skip_group(s, i, "[", "]")
            elif nx == "(":
                j = s.find("\\)", i + 2)
                i = n if j < 0 else j + 2
            elif nx == "[":
                j = s.find("\\]", i + 2)
                i = n if j < 0 else j + 2
            elif nx and _TEX_CMD_RE.match(nx):
                m = _TEX_CMD_RE.match(s, i + 1)
                cmd = m.group(0)
                i = m.end()
                while s[i:i + 1] in (" ", "\t"):
                    i += 1
                if cmd in ("begin", "end") and s[i:i + 1] == "{":
                    j = _skip_group(s, i, "{", "}")
                    env = s[i + 1:j - 1]
                    if cmd == "begin" and env in _MATH_ENVS:
                        endm = re.search(
                            r"\\end\{" + re.escape(env).replace(
                                r"\*", r"\*") + r"\}", s[j:])
                        i = j + endm.end() if endm else n
                    else:
                        i = j                # env shells transparent
                elif cmd == "item":
                    out.append("\n")
                    if s[i:i + 1] == "[":
                        i = _skip_group(s, i, "[", "]")
                        while s[i:i + 1] in (" ", "\t"):
                            i += 1
                elif cmd == "href" and s[i:i + 1] == "{":
                    j = _skip_group(s, i, "{", "}")   # url dropped
                    i = j
                    if s[i:i + 1] == "{":
                        j = _skip_group(s, i, "{", "}")
                        out.append(s[i + 1:j - 1])    # display text
                        i = j
                elif cmd in _TEX_SECT or cmd.rstrip("*") in _TEX_SECT:
                    if s[i:i + 1] == "[":
                        i = _skip_group(s, i, "[", "]")
                    if s[i:i + 1] == "{":
                        j = _skip_group(s, i, "{", "}")
                        out.append("\n" + s[i + 1:j - 1] + "\n")
                        i = j
                elif cmd in _TEX_SYMBOL:
                    out.append(_TEX_SYMBOL[cmd])
                elif cmd in _TEX_KEEP:
                    # unwrap: the brace group re-enters the stream
                    if s[i:i + 1] == "{":
                        i += 1               # parser continues inside;
                        #                      the stray '}' is ignored
                elif cmd in _TEX_DROP:
                    while s[i:i + 1] in "[{":
                        i = _skip_group(s, i, s[i],
                                        "]" if s[i] == "[" else "}")
                # unknown command: name dropped, groups transparent
            else:
                i += 2                       # \<symbol>: dropped
        elif c == "$":
            if s[i + 1:i + 2] == "$":
                j = s.find("$$", i + 2)
                i = n if j < 0 else j + 2
            else:
                j = i + 1
                while j < n:
                    if s[j] == "\\":
                        j += 2
                        continue
                    if s[j] == "$":
                        break
                    j += 1
                i = n if j >= n else j + 1
        elif c in "{}":
            i += 1                           # groups transparent
        elif c == "~":
            out.append(" ")
            i += 1
        else:
            out.append(c)
            i += 1
    text = "".join(out)
    text = "\n".join(ln.rstrip() for ln in text.split("\n"))
    text = re.sub(r"\n{3,}", "\n\n", text)
    return text.strip("\n")


def tex_escape(s: str) -> str:
    """Escape plain text for embedding in a LaTeX fixture such that
    latex_to_text restores it exactly."""
    out = []
    for ch in s:
        if ch in "%&$#_{}":
            out.append("\\" + ch)
        elif ch == "\\":
            out.append("\\textbackslash{}")
        elif ch == "~":
            out.append("\\textasciitilde{}")
        elif ch == "^":
            out.append("\\textasciicircum{}")
        else:
            out.append(ch)
    return "".join(out)


# ------------------------------------------------------------ spark layer

def _text_udf(fn):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def run(col: pd.Series) -> pd.Series:
        return col.map(lambda v: None if v is None else fn(v))

    return run


def strip_markdown(df, col: str, out_col: str = "text"):
    """Markdown column → plain text (Arrow pandas_udf, row-local)."""
    return df.withColumn(out_col, _text_udf(markdown_to_text)(col))


def strip_latex(df, col: str, out_col: str = "text"):
    """LaTeX column → plain text (Arrow pandas_udf, row-local)."""
    return df.withColumn(out_col, _text_udf(latex_to_text)(col))
