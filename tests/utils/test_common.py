

def test_pickle_parquet_roundtrip(tmp_path):
    """reference: replay/utils/spark_utils.py:789-818 — same one-column
    binary parquet layout, loadable across frameworks."""
    from replay_tpu.utils import load_pickled_from_parquet, save_picklable_to_parquet

    obj = {"params": [1.5, 2.5], "name": "als", "nested": {"k": (1, 2)}}
    path = str(tmp_path / "obj.parquet")
    save_picklable_to_parquet(obj, path)
    assert load_pickled_from_parquet(path) == obj
