#!/usr/bin/env python3
"""Gate-window rotation editor: flip ``gate=`` flags on @register call
sites by entry name.

Usage:
    python tools/rotate_window.py --in name1 name2 ... --out name3 ...

``--in`` removes the ``gate=False`` kwarg (entry enters the driver's
50-slot checked window); ``--out`` adds one (entry defers — stays
runnable/benched/pytest-covered, leaves the window). Idempotent; edits
are AST-located but textually minimal (only the decorator call's kwarg
line), so entry-block hashes in tools/rotation_check.py — which strips
the gate kwarg at the AST level — never change from a rotation.
"""

from __future__ import annotations

import argparse
import ast
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG_DIR = REPO / "stream2segment_spark"


def _find_register(tree: ast.Module, name: str):
    for node in tree.body:
        if not isinstance(node, ast.FunctionDef):
            continue
        for dec in node.decorator_list:
            if isinstance(dec, ast.Call) and dec.args \
                    and isinstance(dec.args[0], ast.Constant) \
                    and dec.args[0].value == name:
                return dec
    return None


def _clean_tail(text: str, name: str, stamp: str | None) -> str:
    """Remove rotation-comment / whitespace-only residue between a
    register() call's last argument and its closing paren, optionally
    stamping ONE fresh rotation comment there (ADVICE r8: flipped
    gates left contradictory 'gated this round' comments and blank
    kwarg lines behind). The region is after the last argument by
    construction, so no string-literal content is ever touched —
    rotation_check's ast.unparse block hashes stay stable."""
    tree = ast.parse(text)
    dec = _find_register(tree, name)
    lines = text.splitlines(keepends=True)
    last = max([*dec.args, *[k.value for k in dec.keywords]],
               key=lambda n: (n.end_lineno, n.end_col_offset))
    lo = last.end_lineno               # first candidate line, 0-based
    hi = dec.end_lineno - 1            # the closing-paren line, 0-based
    def _is_residue(ln: str) -> bool:
        s = ln.strip()
        if not s:
            return True                # blanked kwarg line
        if not s.startswith("#"):
            return False
        low = s.lower()
        return any(w in low for w in ("rotation", "gate", "defer",
                                      "slot", "driver-green"))

    out = []
    for i, ln in enumerate(lines):
        if lo <= i < hi and _is_residue(ln):
            continue                   # residue line: drop
        if i == hi and stamp is not None:
            out.append(stamp)
        out.append(ln)
    return "".join(out)


def _flip(path: Path, name: str, gate: bool,
          stamp_round: int | None = None) -> bool:
    text = path.read_text()
    tree = ast.parse(text)
    dec = _find_register(tree, name)
    if dec is None:
        return False
    stamp = (f"    # r{stamp_round} rotation: "
             f"{'gated' if gate else 'deferred'}\n"
             if stamp_round is not None else None)
    gate_kw = next((k for k in dec.keywords if k.arg == "gate"), None)
    currently_gated = (gate_kw is None
                       or (isinstance(gate_kw.value, ast.Constant)
                           and gate_kw.value.value is True))
    if currently_gated == gate:
        # no flip needed — still clean any stale residue in place
        cleaned = _clean_tail(text, name, None)
        if cleaned != text:
            path.write_text(cleaned)
            print(f"  {name}: already "
                  f"{'gated' if gate else 'deferred'} (residue cleaned)")
        else:
            print(f"  {name}: already {'gated' if gate else 'deferred'}")
        return True
    lines = text.splitlines(keepends=True)
    if gate:
        # remove the gate=False kwarg: blank its span (kwarg value end
        # to kwarg start), plus a leading comma/space run
        s_line, s_col = gate_kw.value.lineno - 1, None
        # locate 'gate' keyword start: search backwards on the value line
        seg = "".join(lines)
        # compute absolute offsets
        offs = [0]
        for ln in lines:
            offs.append(offs[-1] + len(ln))
        v_start = offs[gate_kw.value.lineno - 1] + gate_kw.value.col_offset
        v_end = offs[gate_kw.value.end_lineno - 1] + gate_kw.value.end_col_offset
        k_start = seg.rfind("gate", 0, v_start)
        # swallow the preceding comma and whitespace
        i = k_start - 1
        while i >= 0 and seg[i] in " \t\n":
            i -= 1
        if i >= 0 and seg[i] == ",":
            k_start = i
        # swallow a trailing comma directly after the value
        j = v_end
        while j < len(seg) and seg[j] in " \t":
            j += 1
        if j < len(seg) and seg[j] == ",":
            v_end = j + 1
        new = seg[:k_start] + seg[v_end:]
    else:
        # insert ', gate=False' immediately after the LAST argument's
        # AST end position — never scan text backwards from the close
        # paren (a trailing comment line before ')' would swallow the
        # kwarg into the comment)
        offs = [0]
        for ln in lines:
            offs.append(offs[-1] + len(ln))
        seg = "".join(lines)
        last = (dec.keywords[-1].value if dec.keywords
                and (not dec.args
                     or (dec.keywords[-1].value.end_lineno,
                         dec.keywords[-1].value.end_col_offset)
                     > (dec.args[-1].end_lineno,
                        dec.args[-1].end_col_offset))
                else dec.args[-1])
        a_end = offs[last.end_lineno - 1] + last.end_col_offset
        new = seg[:a_end] + ", gate=False" + seg[a_end:]
    new = _clean_tail(new, name, stamp)
    path.write_text(new)
    print(f"  {name}: -> {'GATED' if gate else 'deferred'} ({path.name})")
    return True


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="into", nargs="*", default=[])
    ap.add_argument("--out", dest="outof", nargs="*", default=[])
    ap.add_argument("--round", dest="stamp_round", type=int,
                    default=None,
                    help="stamp '# rN rotation: gated/deferred' on "
                         "each flipped entry (old rotation comments "
                         "are removed either way)")
    args = ap.parse_args()
    files = sorted(PKG_DIR.glob("queries_*.py"))
    missing = []
    for name, gate in ([(n, True) for n in args.into]
                       + [(n, False) for n in args.outof]):
        for path in files:
            if _flip(path, name, gate, args.stamp_round):
                break
        else:
            missing.append(name)
    if missing:
        print(f"NOT FOUND: {missing}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
