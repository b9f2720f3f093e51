"""Independent validation signal (VERDICT round-1 #10).

The model that writes notes also scores them, so a rubber-stamping judgment
must NOT be able to pass a corrupted pair: the deterministic structural
scorer gates the model score per dimension. These tests inject a mismatched
schema-vs-note pair and assert the validator disagrees with a stub engine
that approves everything.
"""

import logging

from video_transformer_tpu.pipeline.validator import ConsistencyValidator
from video_transformer_tpu.utils.counter import APICounter

MATCHED_NOTE = """# 梯度下降精讲

## 梯度下降原理

梯度下降沿负梯度方向更新参数，学习率控制步长。

## 学习率的选择

学习率过大导致发散，过小导致收敛缓慢。
"""
MATCHED_SCHEMA = "学习率 -> 梯度下降 -> 参数更新"
MISMATCHED_SCHEMA = "光合作用 -> 叶绿体 -> 细胞呼吸"


class RubberStamper:
    """A writer-engine stand-in that approves every pair with top marks."""

    byte_vocab = 512

    def wrap_grammar(self, dfa):
        return dfa

    def generate_text(self, prompts, dfa=None):
        return [
            '{"accuracy": "40", "completeness": "30", "visualization": "20",'
            ' "logic": "10", "feedback": "looks great"}'
        ] * len(prompts)


def make_validator(engine=None):
    return ConsistencyValidator(
        {"validator": {"threshold": 75, "use_engine": engine is not None}},
        APICounter(max_calls=50),
        logging.getLogger("test"),
        engine=engine,
    )


class TestIndependentSignal:
    def test_structural_scorer_separates_pairs(self):
        validator = make_validator()
        good = validator.validate(MATCHED_SCHEMA, MATCHED_NOTE)
        bad = validator.validate(MISMATCHED_SCHEMA, MATCHED_NOTE)
        assert good.total_score > bad.total_score
        assert not bad.passed

    def test_rubber_stamp_cannot_pass_corrupted_pair(self):
        """Even a model that outputs 100/100 fails the mismatched schema:
        the independent structural gate bounds every dimension."""
        validator = make_validator(engine=RubberStamper())
        result = validator.validate(MISMATCHED_SCHEMA, MATCHED_NOTE)
        assert not result.passed
        assert result.dimension_scores["accuracy"] < 40

    def test_model_can_still_fail_a_pair(self):
        """The gate is a minimum: a low model score stays low."""

        class Rejecter(RubberStamper):
            def generate_text(self, prompts, dfa=None):
                return [
                    '{"accuracy": "05", "completeness": "05",'
                    ' "visualization": "05", "logic": "05",'
                    ' "feedback": "incoherent"}'
                ] * len(prompts)

        validator = make_validator(engine=Rejecter())
        result = validator.validate(MATCHED_SCHEMA, MATCHED_NOTE)
        assert not result.passed
        assert result.total_score <= 20

    def test_disagreement_rate_nonzero_on_corruptions(self):
        """Across a corrupted-pair corpus, the validator must disagree with
        the rubber-stamping model on every pair (measurable disagreement)."""
        validator = make_validator(engine=RubberStamper())
        corruptions = [
            "量子纠缠 -> 贝尔不等式",
            "罗马帝国 -> 凯撒 -> 元老院",
            "细胞分裂 -> 有丝分裂 -> 染色体",
        ]
        disagreements = sum(
            1
            for schema in corruptions
            if not validator.validate(schema, MATCHED_NOTE).passed
        )
        assert disagreements == len(corruptions)
