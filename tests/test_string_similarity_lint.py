"""Error-string similarity lint vs the reference implementation.

VERDICT r2 item 10 / r3 weak #3: user-facing message strings must be
original prose — two rounds in a row a verbatim reference error string
survived review.  This lint closes the class: every string that can
reach a user through ``raise`` or ``warnings.warn`` in the production
package is shingled and checked against EVERY string literal in the
reference source; any shared run of ``SHINGLE`` characters fails.
"""
import ast
from pathlib import Path

REPO_PKG = Path(__file__).resolve().parent.parent / "phd_qmclib_tpu"
REFERENCE_SRC = Path("/root/reference/src/phd_qmclib")

#: Shared-run length that counts as copying.  Long enough that common
#: technical phrases ("must be divisible by", parameter names) pass;
#: short enough that a lifted sentence cannot.
SHINGLE = 30


def _normalize(text: str) -> str:
    return " ".join(text.split()).lower()


def _string_constants(tree: ast.AST):
    for node in ast.walk(tree):
        if isinstance(node, ast.Constant) and isinstance(node.value, str):
            yield node.value


def _message_strings(tree: ast.AST):
    """Strings reachable through raise statements and warnings.warn
    calls (f-string literal parts included)."""

    def _parts(node):
        for sub in ast.walk(node):
            if isinstance(sub, ast.Constant) and isinstance(sub.value,
                                                            str):
                yield sub.value

    for node in ast.walk(tree):
        if isinstance(node, ast.Raise) and node.exc is not None:
            yield from _parts(node.exc)
        elif isinstance(node, ast.Call):
            func = node.func
            name = getattr(func, "attr", getattr(func, "id", ""))
            if name in ("warn", "warning", "error"):
                for arg in node.args:
                    yield from _parts(arg)


def test_no_reference_error_strings():
    assert REFERENCE_SRC.is_dir(), "reference tree not mounted"
    ref_shingles = set()
    for path in REFERENCE_SRC.rglob("*.py"):
        tree = ast.parse(path.read_text(), filename=str(path))
        for text in _string_constants(tree):
            norm = _normalize(text)
            for i in range(len(norm) - SHINGLE + 1):
                ref_shingles.add(norm[i:i + SHINGLE])
    assert ref_shingles, "reference yielded no string shingles?"

    offenders = []
    for path in sorted(REPO_PKG.rglob("*.py")):
        tree = ast.parse(path.read_text(), filename=str(path))
        for text in _message_strings(tree):
            norm = _normalize(text)
            for i in range(len(norm) - SHINGLE + 1):
                if norm[i:i + SHINGLE] in ref_shingles:
                    offenders.append(
                        (str(path.relative_to(REPO_PKG.parent)),
                         text.strip(), norm[i:i + SHINGLE]))
                    break
    assert not offenders, (
        "message strings share a >={}-char run with reference string "
        "literals — reword them:\n{}".format(
            SHINGLE, "\n".join(f"  {f}: {s!r} (shared: {sh!r})"
                               for f, s, sh in offenders)))
