"""Import-surface parity: every public symbol the reference exports from its
``__init__`` tree must resolve at the same module path under ``replay_tpu``
(``replay.X.Y`` -> ``replay_tpu.X.Y``), so reference users' imports work
unchanged.  Conditional wrappers (reference:
replay/experimental/models/__init__.py:34-50) are allowed to raise
``ConditionalAccessError`` on parent-module access — that IS the reference
behavior when the optional C extension is absent.
"""

import ast
import importlib
from pathlib import Path

import pytest

REFERENCE = Path("/root/reference/replay")

pytestmark = [
    pytest.mark.parity,
    pytest.mark.skipif(not REFERENCE.exists(), reason="reference checkout absent"),
]


def _reference_surface():
    entries = []
    for init in sorted(REFERENCE.rglob("__init__.py")):
        rel = init.relative_to(REFERENCE.parent)
        tree = ast.parse(init.read_text())
        names = []
        for node in ast.walk(tree):
            if isinstance(node, ast.ImportFrom):
                names += [a.asname or a.name for a in node.names]
        mod = str(rel.parent).replace("/", ".")
        for name in sorted({n for n in names if not n.startswith("_")}):
            entries.append((mod, name))
    return entries


def test_every_reference_export_resolves():
    from replay_tpu.experimental.models import ConditionalAccessError

    entries = _reference_surface()
    assert len(entries) > 200, "reference surface scan looks broken"
    missing = []
    for mod, name in entries:
        tmod = "replay_tpu" if mod == "replay" else mod.replace("replay.", "replay_tpu.", 1)
        try:
            getattr(importlib.import_module(tmod), name)
        except ConditionalAccessError:
            continue  # reference contract for conditional wrappers
        except Exception as exc:  # noqa: BLE001
            missing.append(f"{mod}.{name}: {type(exc).__name__}")
    assert not missing, "unresolved reference exports:\n" + "\n".join(missing)


SIGNATURE_CLASSES = {
    "models": [
        "PopRec", "QueryPopRec", "Wilson", "RandomRec", "UCB", "KLUCB",
        "ThompsonSampling", "LinUCB", "ItemKNN", "ALSWrap", "SLIM",
        "Word2VecRec", "AssociationRulesItemRec", "ClusterRec", "CatPopRec",
    ],
    "splitters": [
        "RatioSplitter", "TimeSplitter", "LastNSplitter", "RandomSplitter",
        "RandomNextNSplitter", "NewUsersSplitter", "ColdUserRandomSplitter",
        "TwoStageSplitter", "KFolds",
    ],
    "preprocessing": [
        "LabelEncoder", "Discretizer", "Sessionizer", "CSRConverter",
        "HistoryBasedFeaturesProcessor",
    ],
    "metrics": [
        "NDCG", "MAP", "MRR", "HitRate", "Precision", "Recall", "RocAuc",
        "Coverage", "Novelty", "Surprisal", "Unexpectedness",
        "CategoricalDiversity", "OfflineMetrics", "Experiment",
    ],
}


def test_constructor_kwargs_accept_reference_signatures(reference):
    """Every keyword a reference user passes to these constructors must be
    accepted here (drop-in construction compatibility)."""
    import inspect

    problems = []
    for sub, names in SIGNATURE_CLASSES.items():
        ref_mod = importlib.import_module(f"replay.{sub}")
        our_mod = importlib.import_module(f"replay_tpu.{sub}")
        for name in names:
            ref_cls, our_cls = getattr(ref_mod, name), getattr(our_mod, name)
            ref_params = set(inspect.signature(ref_cls.__init__).parameters) - {"self"}
            our_sig = inspect.signature(our_cls.__init__)
            our_params = set(our_sig.parameters) - {"self"}
            accepts_kwargs = any(
                p.kind is inspect.Parameter.VAR_KEYWORD
                for p in our_sig.parameters.values()
            )
            missing = ref_params - our_params - {"args", "kwargs"}
            if missing and not accepts_kwargs:
                problems.append(f"{sub}.{name}: missing kwargs {sorted(missing)}")
    assert not problems, "\n".join(problems)


MEMBER_CLASSES = {
    "models": [
        "PopRec", "ItemKNN", "ALSWrap", "SLIM", "Word2VecRec", "RandomRec",
        "UCB", "LinUCB", "ClusterRec", "CatPopRec", "AssociationRulesItemRec",
    ],
    "data": ["Dataset", "FeatureSchema", "FeatureInfo"],
    "preprocessing": ["LabelEncoder", "Discretizer", "Sessionizer"],
    "metrics": ["OfflineMetrics", "Experiment", "Mean", "Median", "PerUser", "ConfidenceInterval"],
    "splitters": ["TimeSplitter", "KFolds"],
    "data.nn": ["SequentialDataset", "PandasSequentialDataset", "ParquetDataset", "ParquetModule"],
}


def test_public_members_cover_reference(reference):
    """Every public method/property on these reference classes exists here."""
    import inspect

    problems = []
    for sub, names in MEMBER_CLASSES.items():
        ref_mod = importlib.import_module(f"replay.{sub}")
        our_mod = importlib.import_module(f"replay_tpu.{sub}")
        for name in names:
            ref_cls, our_cls = getattr(ref_mod, name), getattr(our_mod, name)
            ref_members = {
                m
                for m, v in inspect.getmembers(ref_cls)
                if not m.startswith("_") and (callable(v) or isinstance(v, property))
            }
            ours = set(dir(our_cls))
            missing = ref_members - ours
            if missing:
                problems.append(f"{sub}.{name}: missing {sorted(missing)}")
    assert not problems, "\n".join(problems)
