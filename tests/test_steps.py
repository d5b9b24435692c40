"""Step protocol (SURVEY §2.10): assembly-time schema validation and
config plumbing.  The composed clean_corpus_pipeline's VALUE oracle is
the chained-CTE DuckDB twin in the harness suite."""

import pytest
import ray.data

from spider_ray.steps import STEP_REGISTRY, pipeline_from_config


def _docs():
    return ray.data.from_items([
        {"doc_id": 1, "lang": "en",
         # 90 distinct letter-only words (the repetition kernel
         # tokenizes with [a-z]+, so digits would collapse them)
         "text": " ".join(a + b for a in "abcdefghij"
                          for b in "abcdefghij")[:90 * 3 - 1]},
        {"doc_id": 2, "lang": "de", "text": "eins zwei drei " * 30},
        {"doc_id": 3, "lang": "en", "text": "tiny"},
        {"doc_id": 4, "lang": "en", "text": "loop loop loop " * 40},
    ])


def test_unknown_step_rejected(ray_session):
    with pytest.raises(ValueError, match="unknown step"):
        pipeline_from_config(_docs(), [{"step": "nope"}])


def test_schema_validated_at_assembly(ray_session):
    # after chunk the schema is (doc_id, chunk_id, ...); lang_filter
    # can no longer apply — must fail BEFORE execution
    with pytest.raises(ValueError, match="requires columns"):
        pipeline_from_config(_docs(), [
            {"step": "chunk"},
            {"step": "lang_filter", "lang": "en"},
        ])


def test_composed_pipeline_filters_and_chunks(ray_session):
    out = pipeline_from_config(_docs(), [
        {"step": "lang_filter", "lang": "en"},
        {"step": "token_bounds", "min_tokens": 20, "max_tokens": 2000},
        {"step": "max_repetition", "max_rep_e6": 200_000},
        {"step": "chunk", "chunk_tokens": 16, "overlap": 4},
    ]).to_pandas()
    # doc 2 (de), doc 3 (1 token) and doc 4 (pure repetition) are
    # dropped; doc 1 (90 tokens, stride 12) chunks into ceil((90-16)/12)+1
    assert set(out["doc_id"]) == {1}
    assert list(out["chunk_id"]) == list(range(8))
    assert (out["n_tokens"].iloc[:-1] == 16).all()


def test_registry_steps_declare_schemas():
    for s in STEP_REGISTRY.values():
        assert s.name and isinstance(s.schema_in, tuple)
