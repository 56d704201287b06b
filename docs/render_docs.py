"""Render the pisa_tpu documentation to static HTML with the stdlib only.

Sphinx is not installable in the build image (no network), so this renders
a browsable documentation artifact without it (cf. the reference's
documentation workflow, ``.github/workflows/documentation.yml``):

* every ``docs/*.md`` guide through a small CommonMark-subset renderer
  (headings, fenced code, inline code, emphasis, links, lists, tables),
* an API reference page per package in ``docs/source/api/*.rst``
  (``automodule::`` targets are imported and documented from their
  live docstrings/signatures via :mod:`inspect`),
* an index tying them together.

Run:  python docs/render_docs.py [outdir]       (default artifacts/docs_html)
Fails (exit 1) if an automodule target does not import or a cross-referenced
module/attribute in an API stub is missing — the docs build doubles as the
docstring cross-reference check wired into ci.sh.
"""

from __future__ import annotations

import html
import importlib
import inspect
import pathlib
import re
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
DOCS = ROOT / "docs"
if str(ROOT) not in sys.path:  # runnable from any cwd
    sys.path.insert(0, str(ROOT))

_STYLE = """
body { font-family: -apple-system, 'Segoe UI', Roboto, sans-serif;
       max-width: 60em; margin: 2em auto; padding: 0 1em; color: #1a202c;
       line-height: 1.55; }
code, pre { font-family: ui-monospace, 'SF Mono', Consolas, monospace;
            background: #f6f8fa; border-radius: 4px; }
code { padding: 0.1em 0.3em; font-size: 0.92em; }
pre { padding: 0.8em 1em; overflow-x: auto; }
pre code { padding: 0; background: none; }
h1, h2, h3 { line-height: 1.25; margin-top: 1.6em; }
h1 { border-bottom: 2px solid #e2e8f0; padding-bottom: 0.3em; }
h2 { border-bottom: 1px solid #e2e8f0; padding-bottom: 0.2em; }
a { color: #2563eb; text-decoration: none; }
a:hover { text-decoration: underline; }
table { border-collapse: collapse; margin: 1em 0; }
th, td { border: 1px solid #cbd5e0; padding: 0.35em 0.7em;
         text-align: left; }
th { background: #f1f5f9; }
.sig { background: #eef2ff; padding: 0.5em 0.8em; border-radius: 4px;
       margin-top: 1.5em; font-family: ui-monospace, Consolas, monospace;
       font-size: 0.95em; overflow-x: auto; }
.doc { margin: 0.4em 0 0.4em 1.5em; white-space: pre-wrap; }
.kind { color: #64748b; font-size: 0.8em; text-transform: uppercase;
        letter-spacing: 0.05em; }
nav { font-size: 0.9em; margin-bottom: 1.5em; }
"""


def _page(title, body, depth=0):
    home = "../" * depth + "index.html"
    return (
        "<!doctype html><html><head><meta charset='utf-8'>"
        f"<title>{html.escape(title)} — pisa_tpu</title>"
        f"<style>{_STYLE}</style></head><body>"
        f"<nav><a href='{home}'>pisa_tpu docs</a></nav>"
        f"{body}</body></html>"
    )


# --------------------------------------------------------------------- #
# minimal markdown renderer (headings, fences, lists, tables, inline)    #
# --------------------------------------------------------------------- #
def _inline(text):
    text = html.escape(text, quote=False)
    text = re.sub(r"`([^`]+)`", r"<code>\1</code>", text)
    text = re.sub(r"\*\*([^*]+)\*\*", r"<strong>\1</strong>", text)
    text = re.sub(r"(?<!\*)\*([^*]+)\*(?!\*)", r"<em>\1</em>", text)
    text = re.sub(
        r"\[([^\]]+)\]\(([^)]+)\)", r"<a href='\2'>\1</a>", text
    )
    return text


def md_to_html(md):
    out, i = [], 0
    lines = md.splitlines()
    in_list = False
    while i < len(lines):
        line = lines[i]
        if line.startswith("```"):
            block = []
            i += 1
            while i < len(lines) and not lines[i].startswith("```"):
                block.append(lines[i])
                i += 1
            i += 1
            out.append(
                "<pre><code>"
                + html.escape("\n".join(block))
                + "</code></pre>"
            )
            continue
        if in_list and not re.match(r"\s*[-*] ", line):
            out.append("</ul>")
            in_list = False
        m = re.match(r"(#{1,6}) +(.*)", line)
        if m:
            n = len(m.group(1))
            out.append(f"<h{n}>{_inline(m.group(2))}</h{n}>")
        elif re.match(r"\s*[-*] ", line):
            if not in_list:
                out.append("<ul>")
                in_list = True
            out.append(f"<li>{_inline(line.lstrip()[2:])}</li>")
        elif line.startswith("|"):
            rows = []
            while i < len(lines) and lines[i].startswith("|"):
                rows.append(
                    [c.strip() for c in lines[i].strip("|").split("|")]
                )
                i += 1
            cells = "".join(
                f"<th>{_inline(c)}</th>" for c in rows[0]
            )
            body_rows = [
                r for r in rows[1:] if not set("".join(r)) <= set("-: ")
            ]
            table = [f"<table><tr>{cells}</tr>"]
            for r in body_rows:
                table.append(
                    "<tr>"
                    + "".join(f"<td>{_inline(c)}</td>" for c in r)
                    + "</tr>"
                )
            table.append("</table>")
            out.append("".join(table))
            continue
        elif line.strip():
            out.append(f"<p>{_inline(line)}</p>")
        i += 1
    if in_list:
        out.append("</ul>")
    return "\n".join(out)


# --------------------------------------------------------------------- #
# API reference from the api/*.rst automodule stubs                      #
# --------------------------------------------------------------------- #
def _doc_module(modname):
    mod = importlib.import_module(modname)
    parts = [f"<h2 id='{html.escape(modname)}'>{html.escape(modname)}</h2>"]
    if mod.__doc__:
        parts.append(
            f"<div class='doc'>{html.escape(inspect.cleandoc(mod.__doc__))}"
            "</div>"
        )
    public = getattr(mod, "__all__", None)
    if public is None:
        public = [n for n in vars(mod) if not n.startswith("_")]
    for name in public:
        try:
            obj = getattr(mod, name)
        except AttributeError:
            raise RuntimeError(
                f"{modname}.__all__ names missing attribute {name!r}"
            )
        if inspect.ismodule(obj):
            continue
        owned = getattr(obj, "__module__", modname)
        if owned != modname:
            continue  # re-export; documented where it is defined
        kind = (
            "class" if inspect.isclass(obj)
            else "function" if callable(obj)
            else "data"
        )
        try:
            sig = str(inspect.signature(obj)) if callable(obj) else ""
        except (TypeError, ValueError):
            sig = "(...)"
        parts.append(
            f"<div class='sig'><span class='kind'>{kind}</span> "
            f"<strong>{html.escape(name)}</strong>{html.escape(sig)}</div>"
        )
        doc = inspect.getdoc(obj)
        if doc:
            parts.append(f"<div class='doc'>{html.escape(doc)}</div>")
        if inspect.isclass(obj):
            for mname, meth in sorted(vars(obj).items()):
                if mname.startswith("_") or not callable(meth):
                    continue
                mdoc = inspect.getdoc(meth)
                try:
                    msig = str(inspect.signature(meth))
                except (TypeError, ValueError):
                    msig = "(...)"
                parts.append(
                    "<div class='sig' style='margin-left:1.5em'>"
                    f"<span class='kind'>method</span> "
                    f"{html.escape(name)}.<strong>{html.escape(mname)}"
                    f"</strong>{html.escape(msig)}</div>"
                )
                if mdoc:
                    parts.append(
                        "<div class='doc' style='margin-left:3em'>"
                        f"{html.escape(mdoc)}</div>"
                    )
    return "\n".join(parts)


def render(outdir):
    outdir = pathlib.Path(outdir)
    (outdir / "api").mkdir(parents=True, exist_ok=True)
    index_sections = []

    # guides
    guides = []
    for md_path in sorted(DOCS.glob("*.md")):
        name = md_path.stem
        body = (
            f"<h1>{html.escape(name.title())}</h1>"
            + md_to_html(md_path.read_text(encoding="utf-8"))
        )
        (outdir / f"{name}.html").write_text(
            _page(name, body), encoding="utf-8"
        )
        guides.append(f"<li><a href='{name}.html'>{name}</a></li>")
    readme = ROOT / "README.md"
    if readme.is_file():
        (outdir / "readme.html").write_text(
            _page(
                "README",
                md_to_html(readme.read_text(encoding="utf-8")),
            ),
            encoding="utf-8",
        )
        guides.insert(0, "<li><a href='readme.html'>README</a></li>")
    index_sections.append("<h2>Guides</h2><ul>" + "".join(guides) + "</ul>")

    # API reference from the sphinx api stubs (same source of truth)
    api_dir = DOCS / "source" / "api"
    api_links = []
    failures = []
    for rst in sorted(api_dir.glob("*.rst")):
        mods = re.findall(r"automodule:: *([\w.]+)", rst.read_text())
        sections = []
        for modname in mods:
            try:
                sections.append(_doc_module(modname))
            except Exception as exc:  # noqa: BLE001 - collected + reported
                failures.append(f"{rst.name}: {modname}: {exc}")
        body = f"<h1>API: {rst.stem}</h1>" + "\n".join(sections)
        (outdir / "api" / f"{rst.stem}.html").write_text(
            _page(rst.stem, body, depth=1), encoding="utf-8"
        )
        api_links.append(
            f"<li><a href='api/{rst.stem}.html'>pisa_tpu {rst.stem}</a>"
            f" ({len(mods)} modules)</li>"
        )
    index_sections.append(
        "<h2>API reference</h2><ul>" + "".join(api_links) + "</ul>"
    )

    (outdir / "index.html").write_text(
        _page(
            "index",
            "<h1>pisa_tpu documentation</h1>" + "\n".join(index_sections),
        ),
        encoding="utf-8",
    )
    return failures


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else str(
        ROOT / "artifacts" / "docs_html"
    )
    failures = render(outdir)
    if failures:
        print("DOCS RENDER FAILURES:")
        print("\n".join(failures))
        raise SystemExit(1)
    n = len(list(pathlib.Path(outdir).rglob("*.html")))
    print(f"rendered {n} HTML pages into {outdir}")


if __name__ == "__main__":
    main()
