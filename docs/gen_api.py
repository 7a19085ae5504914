"""Generate the markdown API reference (docs/api/*.md) from docstrings.

Counterpart of the reference's Sphinx autodoc pages
(/root/reference/docs/source/api/): one page per module, every public class
with its public methods and every public function, signatures included.
Regenerate after API changes with:  python docs/gen_api.py
"""
from __future__ import annotations

import importlib
import inspect
import os
import pkgutil
import textwrap

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "api")
PKG = "bobe_tpu"
SKIP_MODULES = {"bobe_tpu.config"}  # documented inline in quickstart


def _sig(obj):
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def _doc(obj, indent=""):
    doc = inspect.getdoc(obj)
    if not doc:
        return ""
    return textwrap.indent(doc, indent)


def _is_public(name):
    return not name.startswith("_")


def document_module(modname: str) -> str:
    mod = importlib.import_module(modname)
    lines = [f"# `{modname}`", ""]
    if mod.__doc__:
        lines += [inspect.cleandoc(mod.__doc__), ""]

    members = [(n, o) for n, o in vars(mod).items() if _is_public(n)]
    classes = [(n, o) for n, o in members
               if inspect.isclass(o) and o.__module__ == modname]
    funcs = [(n, o) for n, o in members
             if inspect.isfunction(o) and o.__module__ == modname]

    for name, cls in classes:
        lines += [f"## class `{name}{_sig(cls)}`", ""]
        d = _doc(cls)
        if d:
            lines += [d, ""]
        for mname, meth in inspect.getmembers(cls):
            if not _is_public(mname):
                continue
            if not (inspect.isfunction(meth) or isinstance(
                    inspect.getattr_static(cls, mname, None),
                    (property, classmethod, staticmethod))):
                continue
            raw = inspect.getattr_static(cls, mname, None)
            if isinstance(raw, property):
                lines += [f"### `{name}.{mname}` *(property)*", ""]
                d = _doc(raw.fget) if raw.fget else ""
            else:
                fn = raw.__func__ if isinstance(raw, (classmethod, staticmethod)) else meth
                if getattr(fn, "__qualname__", "").split(".")[0] != name:
                    continue  # inherited
                kind = (" *(classmethod)*" if isinstance(raw, classmethod) else
                        " *(staticmethod)*" if isinstance(raw, staticmethod) else "")
                lines += [f"### `{name}.{mname}{_sig(fn)}`{kind}", ""]
                d = _doc(fn)
            if d:
                lines += [d, ""]

    for name, fn in funcs:
        lines += [f"## `{name}{_sig(fn)}`", ""]
        d = _doc(fn)
        if d:
            lines += [d, ""]
    return "\n".join(lines) + "\n"


def main():
    os.makedirs(OUT, exist_ok=True)
    pkg = importlib.import_module(PKG)
    modnames = [PKG]
    for m in pkgutil.walk_packages(pkg.__path__, prefix=PKG + "."):
        if m.name.rsplit(".", 1)[-1].startswith("_"):
            continue
        modnames.append(m.name)

    index = ["# API reference", "",
             "Generated from docstrings by `docs/gen_api.py` "
             "(counterpart of the reference's Sphinx autodoc).", ""]
    for modname in sorted(modnames):
        if modname in SKIP_MODULES:
            continue
        try:
            text = document_module(modname)
        except Exception as e:  # pragma: no cover
            print(f"skip {modname}: {e}")
            continue
        fname = modname.replace(".", "_") + ".md"
        with open(os.path.join(OUT, fname), "w") as f:
            f.write(text)
        index.append(f"- [`{modname}`]({fname})")
    with open(os.path.join(OUT, "index.md"), "w") as f:
        f.write("\n".join(index) + "\n")
    print(f"wrote {len(modnames)} pages to {OUT}")


if __name__ == "__main__":
    main()
