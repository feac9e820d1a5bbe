#!/usr/bin/env python3
"""Stale-green audit: which catalog entries changed AFTER their last
driver-verified CORRECTNESS row? (VERDICT r6 next-round item #3.)

The driver's correctness gate checks only the first 50 registered
entries per round, so an entry can be rotated out while green and then
have its implementing module change — its latest driver row no longer
covers the code that ships. This tool makes that set explicit so each
round's gate rotation is selected by *changed-since-last-gate*, not
just green-age.

Method
------
- Entry -> implementing files: start from the registered query function
  (the registry knows the function objects), collect the defining
  module plus every ``stream2segment_spark`` module/function reachable
  through its globals and its body's local imports, then close
  transitively over each hit module's own intra-package imports (a
  tokenizer-fold change in ``operators/dedup.py`` must flag an entry
  that only calls ``functions/text.py``).
- Entry -> last driver row: the newest ``CORRECTNESS_r*.json`` that
  contains the entry with a fully-green row; that round's driver commit
  ("round N: verdict/...") timestamps when the verified tree was cut.
- Stale = some implementing file's last commit is NEWER than the
  entry's last-green driver commit (uncommitted working-tree changes
  count as "now"), or the entry has no green driver row at all.
- Queries-module refinement: for the entry's own queries_*.py file a
  timestamp hit only counts if the ENTRY BLOCK (decorator + function +
  same-file helpers it references, transitively; comment lines and
  gate= flips normalized away) differs from the gate-round commit —
  rotation bookkeeping no longer marks the whole catalog stale.

Exit 0 always (it is an audit, not a gate); ``--fail-on-stale`` exits 1
when the stale set is non-empty. No driver state is written.
"""

from __future__ import annotations

import argparse
import ast
import importlib
import importlib.util
import inspect
import json
import re
import subprocess
import sys
import textwrap
import time
import types
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG = "stream2segment_spark"
sys.path.insert(0, str(REPO))


def _git(*args: str) -> str:
    return subprocess.run(["git", *args], cwd=REPO, check=True,
                          capture_output=True, text=True).stdout


def _entry_module():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", REPO / "__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _relpath(f: str | None) -> str | None:
    if not f or f"/{PKG}/" not in f.replace("\\", "/"):
        return None
    p = Path(f).resolve()
    try:
        return str(p.relative_to(REPO))
    except ValueError:
        return None


def _module_file(dotted: str) -> str | None:
    try:
        return _relpath(getattr(importlib.import_module(dotted),
                                "__file__", None))
    except ImportError:
        return None


# the registry module imports EVERY sibling queries module (import-order
# guard), so treating it as a dependency would map every entry to the
# whole catalog; it is pure registration infra — include it only when it
# is the entry's own defining module.
_REGISTRY_FILE = f"{PKG}/queries_catalog.py"


def _is_entrypoint(relfile: str) -> bool:
    return Path(relfile).name.startswith("queries_")


def entry_files(fn) -> set[str]:
    """Repo-relative files implementing one catalog entry (one hop:
    defining module + globals the code references + local imports)."""
    files: set[str] = set()
    f = _relpath(inspect.getfile(fn))
    if f:
        files.add(f)
    defining = f
    g = getattr(fn, "__globals__", {})
    for name in fn.__code__.co_names:
        obj = g.get(name)
        mf = None
        if isinstance(obj, types.ModuleType):
            mf = _relpath(getattr(obj, "__file__", None))
        elif callable(obj) or isinstance(obj, type):
            mod = sys.modules.get(getattr(obj, "__module__", "") or "")
            mf = _relpath(getattr(mod, "__file__", None))
        if mf:
            files.add(mf)
    try:
        src = textwrap.dedent(inspect.getsource(fn))
    except OSError:
        src = ""
    # ast, not a regex: parenthesized multi-line imports
    # (`from pkg.mod import (\n    a, b)`) defeated the previous regex,
    # silently dropping dependencies from the attribution
    try:
        body = ast.parse(src)
    except SyntaxError:
        body = ast.Module(body=[], type_ignores=[])
    for node in ast.walk(body):
        if isinstance(node, ast.ImportFrom) and node.module \
                and node.module.startswith(PKG):
            basef = _module_file(node.module)
            if basef:
                files.add(basef)
            for alias in node.names:
                sub = _module_file(f"{node.module}.{alias.name}")
                if sub:
                    files.add(sub)
        elif isinstance(node, ast.Import):
            for alias in node.names:
                if alias.name.startswith(PKG):
                    mf = _module_file(alias.name)
                    if mf:
                        files.add(mf)
    return {x for x in files if x == defining or x != _REGISTRY_FILE}


def _module_imports(relfile: str) -> set[str]:
    """Intra-package files imported (module level OR nested) by one
    repo file — the transitive-closure edge set."""
    out: set[str] = set()
    try:
        tree = ast.parse((REPO / relfile).read_text())
    except (OSError, SyntaxError):
        return out
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module \
                and node.module.startswith(PKG):
            base = _module_file(node.module)
            if base:
                out.add(base)
            for alias in node.names:
                sub = _module_file(f"{node.module}.{alias.name}")
                if sub:
                    out.add(sub)
        elif isinstance(node, ast.Import):
            for alias in node.names:
                if alias.name.startswith(PKG):
                    mf = _module_file(alias.name)
                    if mf:
                        out.add(mf)
    return out


def close_over_imports(files: set[str],
                       edges: dict[str, set[str]]) -> set[str]:
    """Transitive closure over library-module imports. queries_*.py
    entry-point files are never EXPANDED (each imports the registry,
    which imports every sibling — the closure would cover the whole
    package); the per-entry deps of a queries module are already
    captured precisely through the function's own globals."""
    seen = set(files)
    frontier = [f for f in files if not _is_entrypoint(f)]
    while frontier:
        f = frontier.pop()
        if f not in edges:
            edges[f] = {g for g in _module_imports(f)
                        if not _is_entrypoint(g)}
        for g in edges[f]:
            if g not in seen:
                seen.add(g)
                frontier.append(g)
    return seen


# --- entry-level change detection inside queries_*.py files -----------
#
# File-level timestamps over-trigger for the queries modules: every
# round's gate rotation touches them (comments + gate= flips), which
# marked ALL entries stale in r7 even though almost no entry's own
# registration changed. For the defining queries file we therefore
# compare the ENTRY BLOCK itself — the @register decorator + function
# source, plus every top-level binding in the same file the block
# references (transitively: oracle-building helpers like _bpe_round_sql
# and SQL fragment constants) — between the last-green round's commit
# and the working tree. Pure-comment lines and gate= flips are
# normalized away: they cannot change what the driver verified.
# Library modules (operators/, functions/, ...) keep timestamp logic:
# their files change rarely and a within-file map would have to model
# cross-module call graphs the closure already covers.

def _top_level_bindings(tree: ast.Module) -> dict[str, ast.stmt]:
    out: dict[str, ast.stmt] = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef,
                             ast.ClassDef)):
            out[node.name] = node
        elif isinstance(node, ast.Assign):
            for tgt in node.targets:
                if isinstance(tgt, ast.Name):
                    out[tgt.id] = node
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target,
                                                            ast.Name):
            out[node.target.id] = node
    return out


def _entry_block_text(filetext: str, entry_name: str) -> str | None:
    """The registration block for one entry in one queries module's
    source text: decorator+function segment plus the segments of every
    same-file top-level binding it references, transitively, in a
    deterministic order. None when the entry is not in this text (e.g.
    it did not exist at that commit)."""
    try:
        tree = ast.parse(filetext)
    except SyntaxError:
        return None
    target = None
    for node in tree.body:
        if not isinstance(node, ast.FunctionDef):
            continue
        for dec in node.decorator_list:
            if isinstance(dec, ast.Call) and dec.args \
                    and isinstance(dec.args[0], ast.Constant) \
                    and dec.args[0].value == entry_name:
                target = node
                break
        if target is not None:
            break
    if target is None:
        return None
    bindings = _top_level_bindings(tree)

    def names_in(node: ast.stmt) -> set[str]:
        return {n.id for n in ast.walk(node) if isinstance(n, ast.Name)}

    picked: dict[str, ast.stmt] = {}
    frontier = [target]
    seen_nodes = {id(target)}
    while frontier:
        node = frontier.pop()
        for nm in names_in(node):
            dep = bindings.get(nm)
            if dep is not None and nm not in picked \
                    and id(dep) != id(target):
                picked[nm] = dep
                if id(dep) not in seen_nodes:
                    seen_nodes.add(id(dep))
                    frontier.append(dep)
    # r8: compare ast.unparse'd nodes, not normalized source lines —
    # comments vanish and the gate kwarg is stripped at the AST level,
    # so a rotation flip is invisible REGARDLESS of call layout (the
    # line-level _normalize_block only recognized own-line `gate=False,`
    # flips; single-line @register(...) entries could not be rotated
    # without a false-stale).
    for dec in target.decorator_list:
        if isinstance(dec, ast.Call):
            dec.keywords = [k for k in dec.keywords if k.arg != "gate"]
    parts = [ast.unparse(target)]
    parts += [ast.unparse(picked[nm]) for nm in sorted(picked)]
    return "\n".join(parts)


def _text_at_commit(commit_time: int, relfile: str) -> str | None:
    """File text at the newest commit not after ``commit_time`` (the
    gate-round commit itself, by construction of round_commit_time)."""
    try:
        sha = _git("log", "-1", f"--until=@{commit_time}",
                   "--format=%H").strip()
        if not sha:
            return None
        return _git("show", f"{sha}:{relfile}")
    except subprocess.CalledProcessError:
        return None


def last_green_round(name: str) -> int | None:
    best = None
    for p in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", p.stem).group(1))
        row = json.loads(p.read_text()).get(name)
        if row and row.get("rows_match") and row.get("schema_match") \
                and row.get("hash_match") in (True, None) \
                and not row.get("err"):
            best = rnd if best is None else max(best, rnd)
    return best


def round_commit_time(rnd: int) -> int | None:
    """Timestamp of the driver's round-N commit = when the tree that
    round's CORRECTNESS rows verified was cut."""
    log = _git("log", "--format=%ct %s")
    for line in log.splitlines():
        ct, _, subj = line.partition(" ")
        if re.match(rf"round {rnd}\b.*(verdict|correctness)", subj):
            return int(ct)
    return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fail-on-stale", action="store_true")
    ap.add_argument("--json", action="store_true",
                    help="machine-readable output")
    args = ap.parse_args()

    mod = _entry_module()
    qs = mod.queries()
    from stream2segment_spark import queries_catalog as qc
    gated = set(qc._QUERIES)

    dirty = {ln[3:].strip() for ln in
             _git("status", "--porcelain").splitlines() if ln}
    file_times: dict[str, int] = {}

    def last_commit_time(relfile: str) -> int:
        if relfile in dirty:
            return int(time.time())
        if relfile not in file_times:
            out = _git("log", "-1", "--format=%ct", "--", relfile).strip()
            file_times[relfile] = int(out) if out else 0
        return file_times[relfile]

    round_times: dict[int, int | None] = {}
    edges: dict[str, set[str]] = {}
    cur_text: dict[str, str] = {}
    old_text: dict[tuple[int, str], str | None] = {}
    report = []
    for name, fn in sorted(qs.items()):
        files = close_over_imports(entry_files(fn), edges)
        defining = _relpath(inspect.getfile(fn))
        lg = last_green_round(name)
        if lg is not None and lg not in round_times:
            round_times[lg] = round_commit_time(lg)
        gate_t = round_times.get(lg) if lg is not None else None
        newer = sorted(
            f for f in files
            if gate_t is None or last_commit_time(f) > gate_t)
        # entry-block refinement: a queries-module hit only counts when
        # THIS entry's registration block (normalized) changed since the
        # gate commit — rotation comments and sibling entries don't
        # invalidate a green row
        if gate_t is not None and defining in newer \
                and _is_entrypoint(defining):
            if defining not in cur_text:
                cur_text[defining] = (REPO / defining).read_text()
            key = (gate_t, defining)
            if key not in old_text:
                old_text[key] = _text_at_commit(gate_t, defining)
            then = old_text[key]
            if then is not None:
                now_block = _entry_block_text(cur_text[defining], name)
                then_block = _entry_block_text(then, name)
                if now_block is not None and now_block == then_block:
                    newer = [f for f in newer if f != defining]
        report.append({
            "entry": name,
            "gated": name in gated,
            "last_green_round": lg,
            "stale": bool(newer) or lg is None,
            "changed_since_gate": newer if (lg is not None) else
                sorted(files),
        })

    stale = [r for r in report if r["stale"]]
    if args.json:
        print(json.dumps(report, indent=1))
    else:
        print(f"{len(report)} entries; {len(stale)} stale "
              f"(changed since last driver-green row):")
        for r in stale:
            mark = "GATED" if r["gated"] else "deferred"
            files = ", ".join(r["changed_since_gate"][:4])
            more = len(r["changed_since_gate"]) - 4
            if more > 0:
                files += f" (+{more})"
            print(f"  {r['entry']:32s} last_green=r{r['last_green_round']}"
                  f" [{mark}] {files}")
        fresh_deferred = [r for r in report
                          if not r["stale"] and not r["gated"]]
        print(f"\nrotation guidance: stale GATED entries re-verify this "
              f"round automatically; stale DEFERRED entries should rotate "
              f"IN. {len(fresh_deferred)} deferred entries are fresh "
              f"(safe to keep deferred).")
    return 1 if (stale and args.fail_on_stale) else 0


if __name__ == "__main__":
    sys.exit(main())
