"""K6 — per-language code chunker (SURVEY.md §2.9; reference
transforms/chunker/code_chunking/_language_code_chunkers.py, tree-sitter
based, 1,664 LoC; standard_code_chunking_strategy.py routes by
CodeLanguageLabel).

Tree-sitter does not ship in this container (same class of gap as the HF
tokenizer for the hybrid chunker), so the PYTHON chunker is rebuilt on the
stdlib `ast` parser — a full parser, not a heuristic — reproducing the
reference's chunk-composition rules (_language_code_chunkers.py:477-640):

- one chunk per function/method; its content prepends the imports the
  function actually uses (:558-576), the module variables it reads
  (:594-605), and for methods the class signature + class-level fields
  (:581-592), with the docstring HOISTED out of the content into chunk
  metadata (:607-611 — content carries `function_no_docstring`)
- classes with no methods chunk whole (:514-523)
- module-level code claimed by no chunk becomes per-gap "orphan"/preamble
  chunks (:526-529 via _RangeTracker.find_gaps); copyright/license
  comments are dropped (:533-540)
- metadata: part name, docstring, start/end line, signature end line
- oversized chunks split under a token budget (the `_ChunkSizeProcessor`
  role) with the SAME BPE-ish counter the hybrid chunker budgets with

C / Java / JavaScript / TypeScript fall back to a documented
brace-matching top-level function splitter (same output schema, no
import/variable context) — the reference's per-language tree-sitter
grammars have no stdlib equivalent.

Spark shape: one zero-shuffle mapInPandas over (doc_id, language, code) —
identical to the serializer sinks; chunking is a per-document fold, so it
partitions embarrassingly at 100 TB.
"""

from __future__ import annotations

import ast
import re
from typing import Iterable, Iterator, List, Tuple

import pandas as pd

from docling_spark.operators.hybrid_chunker import count_tokens

CODE_CHUNK_DDL = (
    "doc_id string, chunk_id int, part_name string, chunk_type string, "
    "start_line int, end_line int, signature_end_line int, "
    "docstring string, content string, n_tokens int"
)

_COPYRIGHT_WORDS = ("copyright", "license", "licensed under", "all rights reserved")


def _seg(lines: List[str], a: int, b: int) -> str:
    """1-based inclusive line slice."""
    return "\n".join(lines[a - 1 : b])


def _py_imports(tree: ast.Module) -> dict:
    """alias/name → (start_line, end_line) of the import statement —
    mirrors _get_imports (:1099-1123: aliased imports register both the
    alias and the original name)."""
    out: dict = {}
    for node in tree.body:
        if isinstance(node, ast.Import):
            for al in node.names:
                out[(al.asname or al.name).split(".")[0]] = (node.lineno, node.end_lineno)
                out[al.name.split(".")[0]] = (node.lineno, node.end_lineno)
        elif isinstance(node, ast.ImportFrom):
            for al in node.names:
                out[al.asname or al.name] = (node.lineno, node.end_lineno)
                out[al.name] = (node.lineno, node.end_lineno)
    return out


def _py_module_vars(tree: ast.Module) -> dict:
    """name → (start_line, end_line) for top-level assignments
    (_get_module_variables :1125-1142)."""
    out: dict = {}
    for node in tree.body:
        if isinstance(node, ast.Assign):
            for tgt in node.targets:
                if isinstance(tgt, ast.Name):
                    out[tgt.id] = (node.lineno, node.end_lineno)
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            out[node.target.id] = (node.lineno, node.end_lineno)
    return out


def _py_used_names(node: ast.AST) -> set:
    return {n.id for n in ast.walk(node) if isinstance(n, ast.Name)}


def _py_sig_end(node) -> int:
    """Last line of the signature: the line before the first body stmt."""
    return (node.body[0].lineno - 1) if node.body else node.end_lineno


def _py_strip_docstring(node, lines: List[str]) -> str:
    """Function/class text with its docstring statement removed (the
    reference strips the docstring from content and carries it in meta)."""
    start = node.lineno
    if node.decorator_list:
        start = min(d.lineno for d in node.decorator_list)
    body = node.body
    if (body and isinstance(body[0], ast.Expr)
            and isinstance(body[0].value, ast.Constant)
            and isinstance(body[0].value.value, str)):
        ds = body[0]
        pre = _seg(lines, start, ds.lineno - 1)
        post = _seg(lines, ds.end_lineno + 1, node.end_lineno)
        if len(body) == 1:  # docstring-only body must stay syntactically valid
            indent = " " * (ds.col_offset)
            post = f"{indent}pass" + (("\n" + post) if post else "")
        return pre + ("\n" + post if post else "")
    return _seg(lines, start, node.end_lineno)


def _py_class_context(cls: ast.ClassDef, lines: List[str]) -> Tuple[str, List[Tuple[int, int]]]:
    """Class signature + class-level fields, no sibling methods and no
    class docstring (additional_context_no_docstring, :581-592)."""
    rngs = [(cls.lineno, cls.body[0].lineno - 1 if cls.body else cls.end_lineno)]
    parts = [_seg(lines, *rngs[0])]
    for node in cls.body:
        if isinstance(node, (ast.Assign, ast.AnnAssign)):
            rngs.append((node.lineno, node.end_lineno))
            parts.append(_seg(lines, node.lineno, node.end_lineno))
    return "\n".join(parts), rngs


def _chunk_rows_python(code: str) -> List[tuple]:
    """(part_name, chunk_type, start, end, sig_end, docstring, content)."""
    lines = code.split("\n")
    try:
        tree = ast.parse(code)
    except (SyntaxError, ValueError, MemoryError, RecursionError):
        # unparseable payloads degrade to one whole-file preamble chunk,
        # never a job failure
        return [("", "preamble", 1, len(lines), 1, "", code)]

    imports = _py_imports(tree)
    module_vars = _py_module_vars(tree)
    used: List[Tuple[int, int]] = [rng for rng in imports.values()]

    def fn_targets():
        for node in tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                yield node, None
            elif isinstance(node, ast.ClassDef):
                for sub in node.body:
                    if isinstance(sub, (ast.FunctionDef, ast.AsyncFunctionDef)):
                        yield sub, node

    rows: List[tuple] = []
    classes_with_methods: set = set()
    for fn, cls in fn_targets():
        names = _py_used_names(fn)
        ctx, ctx_rngs = ("", [])
        part = fn.name
        if cls is not None:
            classes_with_methods.add(cls.name)
            ctx, ctx_rngs = _py_class_context(cls, lines)
            part = f"{cls.name}.{fn.name}"
        imp_lines = sorted({imports[n] for n in sorted(names) if n in imports})
        var_lines = sorted({module_vars[n] for n in sorted(names)
                            if n in module_vars and n not in imports})
        pieces = [_seg(lines, a, b) for a, b in imp_lines]
        pieces += [_seg(lines, a, b) for a, b in var_lines]
        if ctx:
            pieces.append(ctx)
        body_txt = _py_strip_docstring(fn, lines)
        pieces.append(body_txt)
        start = fn.lineno
        if fn.decorator_list:
            start = min(d.lineno for d in fn.decorator_list)
        used.append((start, fn.end_lineno))
        used.extend(imp_lines)
        used.extend(var_lines)
        used.extend(ctx_rngs)
        rows.append((part, "function", start, fn.end_lineno, _py_sig_end(fn),
                     ast.get_docstring(fn) or "", "\n".join(p for p in pieces if p)))

    for node in tree.body:  # classes with no methods chunk whole (:514-523)
        if isinstance(node, ast.ClassDef) and node.name not in classes_with_methods:
            used.append((node.lineno, node.end_lineno))
            rows.append((node.name, "class", node.lineno, node.end_lineno,
                         _py_sig_end(node), ast.get_docstring(node) or "",
                         _py_strip_docstring(node, lines)))
        elif isinstance(node, ast.ClassDef):
            used.append((node.lineno, node.end_lineno))

    # copyright comments are dropped, not orphaned (:533-540)
    for i, ln in enumerate(lines, 1):
        s = ln.strip().lower()
        if s.startswith("#") and any(w in s for w in _COPYRIGHT_WORDS):
            used.append((i, i))

    # gaps → preamble chunks (find_gaps :70-85); module vars consumed by a
    # function chunk are already in `used`
    covered = set()
    for a, b in used:
        covered.update(range(a, b + 1))
    gap: List[int] = []
    gaps: List[Tuple[int, int]] = []
    for i in range(1, len(lines) + 1):
        if i not in covered and lines[i - 1].strip():
            gap.append(i)
        elif gap:
            gaps.append((gap[0], gap[-1]))
            gap = []
    if gap:
        gaps.append((gap[0], gap[-1]))
    for a, b in gaps:
        rows.append(("", "preamble", a, b, a, "", _seg(lines, a, b)))

    rows.sort(key=lambda r: (r[2], r[0]))
    return rows


_BRACE_FN_RE = re.compile(
    r"^[ \t]*(?:[\w$<>\[\],&*:~ ]+?[ \t]+)?([\w$~]+)[ \t]*\([^;{}]*\)[ \t\w,:<>\[\]]*\{",
    re.M,
)


def _chunk_rows_braces(code: str) -> List[tuple]:
    """C / Java / JS / TS fallback: top-level `name(args) {...}` blocks by
    brace matching; everything between functions is preamble."""
    lines = code.split("\n")
    rows: List[tuple] = []
    used: set = set()
    for m in _BRACE_FN_RE.finditer(code):
        depth, end = 0, None
        for j in range(m.end() - 1, len(code)):
            if code[j] == "{":
                depth += 1
            elif code[j] == "}":
                depth -= 1
                if depth == 0:
                    end = j
                    break
        if end is None:
            continue
        start_line = code.count("\n", 0, m.start()) + 1
        end_line = code.count("\n", 0, end) + 1
        sig_end = code.count("\n", 0, m.end() - 1) + 1
        if any(i in used for i in range(start_line, end_line + 1)):
            continue  # nested block inside an already-claimed function
        used.update(range(start_line, end_line + 1))
        rows.append((m.group(1), "function", start_line, end_line, sig_end,
                     "", _seg(lines, start_line, end_line)))
    gap: List[int] = []
    gaps: List[Tuple[int, int]] = []
    for i in range(1, len(lines) + 1):
        if i not in used and lines[i - 1].strip():
            gap.append(i)
        elif gap:
            gaps.append((gap[0], gap[-1]))
            gap = []
    if gap:
        gaps.append((gap[0], gap[-1]))
    for a, b in gaps:
        rows.append(("", "preamble", a, b, a, "", _seg(lines, a, b)))
    rows.sort(key=lambda r: (r[2], r[0]))
    return rows


def chunk_code_document(doc_id: str, language: str, code: str,
                        max_tokens: int = 5000) -> List[tuple]:
    """One document → CODE_CHUNK_DDL rows. Oversized chunks split on line
    boundaries under `max_tokens` (the _ChunkSizeProcessor role; reference
    default max_tokens=5000, :1074)."""
    lang = (language or "").lower()
    if lang == "python":
        rows = _chunk_rows_python(code)
    else:
        rows = _chunk_rows_braces(code)
    out: List[tuple] = []
    cid = 0
    for part, ctype, a, b, sig, doc, content in rows:
        pieces = [content]
        if count_tokens(content) > max_tokens:
            pieces, cur = [], []
            cur_tokens = 0
            for ln in content.split("\n"):
                t = count_tokens(ln)
                if cur and cur_tokens + t > max_tokens:
                    pieces.append("\n".join(cur))
                    cur, cur_tokens = [], 0
                cur.append(ln)
                cur_tokens += t
            if cur:
                pieces.append("\n".join(cur))
        for piece in pieces:
            out.append((doc_id, cid, part, ctype, a, b, sig, doc, piece,
                        count_tokens(piece)))
            cid += 1
    return out


def code_chunk_sink(df, id_col: str = "doc_id", lang_col: str = "language",
                    code_col: str = "code", max_tokens: int = 5000):
    """(doc_id, language, code) → code-chunk table. Zero-shuffle
    mapInPandas, like every sink."""

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "chunk_id", "part_name", "chunk_type", "start_line",
                "end_line", "signature_end_line", "docstring", "content",
                "n_tokens"]
        for pdf in batches:
            rows: List[tuple] = []
            for doc_id, lang, code in zip(pdf[id_col], pdf[lang_col], pdf[code_col]):
                rows.extend(chunk_code_document(str(doc_id), lang, code, max_tokens))
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(gen, schema=CODE_CHUNK_DDL)


# ---------------------------------------------------------------------------
# deterministic demo corpus (the testdata tables carry no source code; the
# reference's code-chunking tests construct their own code items too)
# ---------------------------------------------------------------------------

_PY_TMPL = '''# Copyright {year} Example. All rights reserved.
"""Module m{i}."""
import os
import json as j
from math import sqrt

LIMIT_{i} = {limit}
TAG = "m{i}"

def area_{i}(r):
    """Scaled square root #{i}."""
    return sqrt(r) * LIMIT_{i}

def dump_{i}(x):
    return j.dumps({{"v": x, "tag": TAG}})

class Shape{i}:
    kind = "s{i}"

    def describe(self):
        """Describe shape {i}."""
        return os.path.join(self.kind, TAG)

class Marker{i}:
    """Empty marker class {i}."""

print(area_{i}({i}))
'''

_C_TMPL = '''/* helper module {i} */
#include <stdio.h>

static int scale_{i}(int x) {{
    return x * {limit};
}}

int main(void) {{
    printf("%d", scale_{i}({i}));
    return 0;
}}
'''

_JS_TMPL = '''// module {i}
const LIMIT_{i} = {limit};

function area_{i}(r) {{
    return Math.sqrt(r) * LIMIT_{i};
}}

module.exports = {{ area_{i} }};
'''


def synth_code_rows(n: int = 16, seed: int = 7) -> List[tuple]:
    """(doc_id, language, code) — deterministic mixed-language corpus;
    `seed` offsets the templated constants so distinct corpora don't
    collide."""
    rows = []
    for i in range(n):
        limit = (i * 31 + seed) % 97 + 3
        if i % 4 == 2:
            rows.append((f"code-{i:03d}", "c",
                         _C_TMPL.format(i=i, limit=limit)))
        elif i % 4 == 3:
            rows.append((f"code-{i:03d}", "javascript",
                         _JS_TMPL.format(i=i, limit=limit)))
        else:
            rows.append((f"code-{i:03d}", "python",
                         _PY_TMPL.format(i=i, limit=limit, year=2020 + i % 6)))
    return rows
