"""Generate the markdown API reference under docs/api_reference/ from the
package's docstrings (zero-dependency replacement for mkdocstrings; the
reference uses mkdocs-material + mkdocstrings, `/root/reference/mkdocs.yml`).

Run from the repo root:  python scripts/gen_api_docs.py
"""

from __future__ import annotations

import importlib
import inspect
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "api_reference")

# page -> (title, [(module, [names])])
PAGES = {
    "laplace.md": ("Laplace Frontend", [("laplace_jax.laplace", ["Laplace"])]),
    "enums.md": ("Options (enums)", [(
        "laplace_jax.enums",
        ["SubsetOfWeights", "HessianStructure", "Likelihood", "PredType",
         "LinkApprox", "TuningMethod", "PriorStructure", "FeatureReduction"],
    )]),
    "baselaplace.md": ("Base Laplace", [(
        "laplace_jax.baselaplace", ["BaseLaplace"]
    )]),
    "parametriclaplace.md": ("Parametric Laplace", [(
        "laplace_jax.baselaplace",
        ["ParametricLaplace", "FullLaplace", "KronLaplace", "DiagLaplace",
         "LowRankLaplace"],
    )]),
    "functionallaplace.md": ("Functional (GP) Laplace", [(
        "laplace_jax.functional_laplace",
        ["FunctionalLaplace", "FunctionalLLLaplace"],
    )]),
    "lllaplace.md": ("Last-Layer Laplace", [(
        "laplace_jax.lllaplace",
        ["LLLaplace", "FullLLLaplace", "KronLLLaplace", "DiagLLLaplace"],
    )]),
    "subnetlaplace.md": ("Subnetwork Laplace", [(
        "laplace_jax.subnetlaplace",
        ["SubnetLaplace", "FullSubnetLaplace", "DiagSubnetLaplace"],
    )]),
    "curvatures.md": ("Curvature backend", [
        ("laplace_jax.curvature.backend",
         ["CurvatureBackend", "GGNBackend", "EFBackend", "HessianBackend"]),
        ("laplace_jax.curvature.kfac", ["kfac_factors", "conv_patches"]),
        ("laplace_jax.curvature.diag_taps", ["diag_curvature_taps"]),
        ("laplace_jax.curvature.lanczos", ["lanczos_eig_curvature"]),
    ]),
    "nnmodel.md": ("Model adapter", [(
        "laplace_jax.nnmodel", ["NNModel", "LayerTap"]
    )]),
    "marglik_training.md": ("Marglik Training", [(
        "laplace_jax.marglik_training", ["marglik_training"]
    )]),
    "parallel.md": ("Parallelism", [(
        "laplace_jax.parallel.sharding",
        ["DataParallel", "data_mesh", "multihost_mesh", "shard_closure",
         "shard_map_closure"],
    )]),
    "utils.md": ("Utilities", [
        ("laplace_jax.utils.matrix", ["Kron", "KronDecomposed"]),
        ("laplace_jax.utils.linalg",
         ["symeig", "invsqrt_precision", "normal_samples", "kron",
          "block_diag"]),
        ("laplace_jax.utils.subnetmask",
         ["SubnetMask", "ScoreBasedSubnetMask", "RandomSubnetMask",
          "LargestMagnitudeSubnetMask", "LargestVarianceDiagLaplaceSubnetMask",
          "LargestVarianceSWAGSubnetMask", "ParamNameSubnetMask",
          "ModuleNameSubnetMask", "LastLayerSubnetMask"]),
        ("laplace_jax.utils.swag", ["fit_diagonal_swag_var"]),
        ("laplace_jax.utils.metrics", ["RunningNLLMetric", "RunningMSEMetric"]),
        ("laplace_jax.utils.validate", ["validate"]),
        ("laplace_jax.utils.data", ["ArrayLoader", "dataset_size"]),
        ("laplace_jax.utils.prior",
         ["fix_prior_prec_structure", "expand_prior_precision"]),
        ("laplace_jax.utils.serialization",
         ["save_state_dict", "load_state_dict"]),
        ("laplace_jax.utils.sod", ["sod_indices"]),
    ]),
}


def _sig(obj) -> str:
    try:
        return str(inspect.signature(obj))
    except (TypeError, ValueError):
        return "(...)"


def _doc(obj) -> str:
    d = inspect.getdoc(obj)
    return d if d else ""


def render_function(name, fn, level="##") -> str:
    out = [f"{level} `{name}{_sig(fn)}`", ""]
    doc = _doc(fn)
    if doc:
        out += [doc, ""]
    return "\n".join(out)


def render_class(name, cls) -> str:
    out = [f"## `{name}{_sig(cls)}`" if not _is_enum(cls) else f"## `{name}`", ""]
    doc = _doc(cls)
    if doc:
        out += [doc, ""]
    if _is_enum(cls):
        out.append("| member | value |")
        out.append("|---|---|")
        for m in cls:
            out.append(f"| `{m.name}` | `{m.value}` |")
        out.append("")
        return "\n".join(out)
    # properties
    props = [
        (n, p) for n, p in inspect.getmembers(cls, lambda o: isinstance(o, property))
        if not n.startswith("_")
    ]
    for n, p in sorted(props):
        d = _doc(p.fget) if p.fget else ""
        out.append(f"### `{name}.{n}` *(property)*")
        out.append("")
        if d:
            out += [d, ""]
    # methods defined on this class or inherited public API
    for n, m in sorted(inspect.getmembers(cls, inspect.isfunction)):
        if n.startswith("_") and n not in ("__call__",):
            continue
        out.append(f"### `{name}.{n}{_sig(m)}`")
        out.append("")
        d = _doc(m)
        if d:
            out += [d, ""]
    return "\n".join(out)


def _is_enum(cls) -> bool:
    import enum

    return isinstance(cls, type) and issubclass(cls, enum.Enum)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for page, (title, sections) in PAGES.items():
        parts = [f"# {title}", ""]
        for modname, names in sections:
            mod = importlib.import_module(modname)
            mdoc = _doc(mod)
            parts.append(f"*Module: `{modname}`*")
            parts.append("")
            if mdoc:
                parts += [mdoc, ""]
            for name in names:
                obj = getattr(mod, name)
                if inspect.isclass(obj):
                    parts.append(render_class(name, obj))
                else:
                    parts.append(render_function(name, obj))
                parts.append("")
        with open(os.path.join(OUT, page), "w") as f:
            f.write("\n".join(parts))
        print("wrote", page)


if __name__ == "__main__":
    main()
