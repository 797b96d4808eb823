"""Generate doc/options.md: an options reference scraped from the source.

Every config option in tenpy_tpu is read through ``options.get(key,
default, ...)`` (the defaults-recording accessor of
:class:`tenpy_tpu.tools.params.Config`) or ``opts.get(...)`` on plain
dicts in the device engines.  This script scans the package for those
call sites, grouped by module and enclosing class/function, and emits a
markdown table per group — the same role as the reference's
sphinx ``:cfg:config:`` directives (`tenpy/tools/params.py`), built from
the code so it cannot drift.

Usage:  python doc/make_options_ref.py   (rewrites doc/options.md)
"""
import ast
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, 'tenpy_tpu')
OUT = os.path.join(REPO, 'doc', 'options.md')

RECEIVERS = {'options', 'opts', 'trunc_par', 'trunc_params', 'params',
             'model_params', 'sim_params', 'lanczos_params', 'mixer_params',
             'config'}


def _literal(node):
    try:
        return repr(ast.literal_eval(node))
    except Exception:  # noqa: BLE001 — non-literal default: show source-ish
        return ast.unparse(node) if hasattr(ast, 'unparse') else '...'


def scan_file(path):
    """Yield (scope, receiver, key, default) for every cfg .get call."""
    with open(path) as f:
        try:
            tree = ast.parse(f.read())
        except SyntaxError:
            return
    scopes = []  # stack of names

    class V(ast.NodeVisitor):
        def _scoped(self, node):
            scopes.append(node.name)
            self.generic_visit(node)
            scopes.pop()

        visit_ClassDef = _scoped
        visit_FunctionDef = _scoped
        visit_AsyncFunctionDef = _scoped

        def visit_Call(self, node):
            f = node.func
            if (isinstance(f, ast.Attribute) and f.attr == 'get'
                    and isinstance(f.value, ast.Name)
                    and f.value.id in RECEIVERS and node.args
                    and isinstance(node.args[0], ast.Constant)
                    and isinstance(node.args[0].value, str)):
                default = _literal(node.args[1]) if len(node.args) > 1 \
                    else '—'
                hits.append(('.'.join(scopes) or '<module>', f.value.id,
                             node.args[0].value, default))
            self.generic_visit(node)

    hits = []
    V().visit(tree)
    return hits


def main():
    lines = ["# Options reference (generated)",
             "",
             "Scraped from every `options.get(key, default)` call site by",
             "`doc/make_options_ref.py` — regenerate after adding options.",
             "Defaults shown are the in-code defaults; the `Config` class",
             "records reads and warns about unused keys",
             "(`tenpy_tpu/tools/params.py`).", ""]
    for root, _dirs, files in sorted(os.walk(PKG)):
        for fn in sorted(files):
            if not fn.endswith('.py'):
                continue
            path = os.path.join(root, fn)
            hits = scan_file(path) or []
            if not hits:
                continue
            rel = os.path.relpath(path, REPO)
            lines.append(f"## `{rel}`")
            lines.append("")
            lines.append("| scope | option | default |")
            lines.append("|---|---|---|")
            seen = set()
            for scope, recv, key, default in hits:
                row = (scope, key)
                if row in seen:
                    continue
                seen.add(row)
                d = default.replace('|', r'\|')
                lines.append(f"| `{scope}` | `{key}` | `{d}` |")
            lines.append("")
    with open(OUT, 'w') as f:
        f.write('\n'.join(lines) + '\n')
    print(f"wrote {OUT} ({len(lines)} lines)")


if __name__ == '__main__':
    sys.exit(main())
