"""Regenerate docs/api.md from docstrings.

Usage:  python scripts/gen_api_docs.py
"""

import importlib
import inspect
import os
import re
import sys
import textwrap

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

MODULES = [
    "flamo_tpu.core",
    "flamo_tpu.utils",
    "flamo_tpu.functional",
    "flamo_tpu.processor.dsp",
    "flamo_tpu.processor.system",
    "flamo_tpu.ops.solve",
    "flamo_tpu.ops.linop",
    "flamo_tpu.ops.pallas_solve",
    "flamo_tpu.ops.pallas_eig",
    "flamo_tpu.ops.qr_eig",
    "flamo_tpu.optimize.dataset",
    "flamo_tpu.optimize.trainer",
    "flamo_tpu.optimize.loss",
    "flamo_tpu.optimize.surface",
    "flamo_tpu.optimize.utils",
    "flamo_tpu.auxiliary.eq",
    "flamo_tpu.auxiliary.minimize",
    "flamo_tpu.auxiliary.scattering",
    "flamo_tpu.auxiliary.reverb",
    "flamo_tpu.auxiliary.filterbank",
    "flamo_tpu.auxiliary.velvet",
    "flamo_tpu.auxiliary.config",
    "flamo_tpu.parallel.mesh",
    "flamo_tpu.parallel.dp",
    "flamo_tpu.parallel.ensemble",
    "flamo_tpu.parallel.fused",
    "flamo_tpu.models.colorless_fdn",
    "flamo_tpu.models.attenuated_fdn",
    "flamo_tpu.models.scattering_fdn",
    "flamo_tpu.models.active_acoustics",
    "flamo_tpu.models.dispatch",
]


def first_para(doc):
    if not doc:
        return ""
    doc = inspect.cleandoc(doc)
    return doc.split("\n\n")[0].strip()


def sig_of(obj):
    try:
        sig = str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"
    # default-value reprs carry process-specific addresses; strip them so
    # regenerated docs do not churn
    return re.sub(r" at 0x[0-9a-f]+", "", sig)


def public_members(mod):
    names = getattr(mod, "__all__", None)
    if names is None:
        names = [n for n in vars(mod) if not n.startswith("_")]
    out = []
    for n in names:
        obj = getattr(mod, n, None)
        if obj is None or inspect.ismodule(obj):
            continue
        if getattr(obj, "__module__", None) != mod.__name__:
            continue
        # callable() rather than isfunction(): jax.custom_vjp /
        # functools.partial wrappers (poly_roots, expm, ...) are not
        # plain functions but are part of the public API
        if inspect.isclass(obj) or (callable(obj)
                                    and getattr(obj, "__doc__", None)):
            out.append((n, obj))
    return out


def render_module(name):
    mod = importlib.import_module(name)
    lines = [f"## `{name}`", ""]
    if mod.__doc__:
        lines += [first_para(mod.__doc__), ""]
    for n, obj in public_members(mod):
        if inspect.isclass(obj):
            init = obj.__init__ if "__init__" in vars(obj) else None
            sig = sig_of(init).replace("(self, ", "(").replace(
                "(self)", "()") if init else "()"
            lines += [f"### class `{n}{sig}`", ""]
            if obj.__doc__:
                lines += [first_para(obj.__doc__), ""]
            for mn, mobj in vars(obj).items():
                if mn.startswith("_") or not inspect.isfunction(mobj):
                    continue
                summary = first_para(mobj.__doc__).split("\n")[0]
                msig = sig_of(mobj)
                entry = f"- `{mn}{msig}`"
                if summary:
                    entry += f" — {summary}"
                lines.append(entry)
            if lines[-1].startswith("- "):
                lines.append("")
        else:
            lines += [f"### `{n}{sig_of(obj)}`", ""]
            if obj.__doc__:
                lines += [first_para(obj.__doc__), ""]
    return "\n".join(lines).rstrip() + "\n"


def main():
    parts = [
        "# API reference",
        "",
        "Generated from docstrings. Reference file:line citations point at",
        "`/root/reference` (the PyTorch original) for parity checking.",
        "",
    ]
    for name in MODULES:
        parts.append(render_module(name))
        parts.append("")
    out = os.path.join(os.path.dirname(__file__), "..", "docs", "api.md")
    with open(out, "w") as f:
        f.write("\n".join(parts).rstrip() + "\n")
    print(f"wrote {os.path.normpath(out)}")


if __name__ == "__main__":
    main()
