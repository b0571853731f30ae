"""Optimizer / LR-scheduler factory tests (reference:
tests/nn/lightning/test_factory.py)."""

import pytest as _pytest

pytestmark = _pytest.mark.nn

import jax.numpy as jnp
import numpy as np
import optax
import pytest

from replay_tpu.nn.training import LRSchedulerFactory, OptimizerFactory


def _apply_once(opt, lr_probe_steps=1):
    params = {"w": jnp.ones(3)}
    state = opt.init(params)
    grads = {"w": jnp.full(3, 0.5)}
    updates, _ = opt.update(grads, state, params)
    return updates


class TestOptimizerFactory:
    @pytest.mark.parametrize("algorithm", ["adam", "adamw", "sgd"])
    def test_algorithms_build_and_step(self, algorithm):
        opt = OptimizerFactory(1e-2, algorithm=algorithm).create()
        updates = _apply_once(opt)
        assert np.isfinite(np.asarray(updates["w"])).all()

    def test_weight_decay_implies_adamw(self):
        plain = OptimizerFactory(1e-2).create()
        decayed = OptimizerFactory(1e-2, weight_decay=0.1).create()
        params = {"w": jnp.full(3, 10.0)}
        g = {"w": jnp.zeros(3)}
        up_plain, _ = plain.update(g, plain.init(params), params)
        up_decay, _ = decayed.update(g, decayed.init(params), params)
        # zero grads: plain adam gives ~zero update, adamw still shrinks w
        assert abs(float(up_decay["w"][0])) > abs(float(up_plain["w"][0]))
        assert float(up_decay["w"][0]) < 0

    def test_clip_norm_bounds_update(self):
        opt = OptimizerFactory(1.0, algorithm="sgd", clip_norm=0.1).create()
        params = {"w": jnp.zeros(3)}
        g = {"w": jnp.full(3, 100.0)}
        updates, _ = opt.update(g, opt.init(params), params)
        assert float(jnp.linalg.norm(updates["w"])) <= 0.1 + 1e-6

    def test_unknown_algorithm_raises(self):
        with pytest.raises(ValueError, match="Unknown optimizer"):
            OptimizerFactory(1e-2, algorithm="lion").create()

    def test_sgd_momentum(self):
        opt = OptimizerFactory(1e-1, algorithm="sgd", momentum=0.9).create()
        updates = _apply_once(opt)
        assert np.isfinite(np.asarray(updates["w"])).all()


class TestLRSchedulerFactory:
    def test_cosine_warmup_shape(self):
        sched = LRSchedulerFactory(warmup_steps=10, decay="cosine", total_steps=100).create(1.0)
        assert float(sched(0)) == pytest.approx(0.0)
        assert float(sched(10)) == pytest.approx(1.0)
        assert float(sched(100)) == pytest.approx(0.0, abs=1e-6)
        assert float(sched(55)) < 1.0

    def test_linear_decay(self):
        sched = LRSchedulerFactory(warmup_steps=0, decay="linear", total_steps=10).create(1.0)
        mid = float(sched(5))
        assert 0.0 < mid < 1.0
        assert float(sched(10)) == pytest.approx(0.0, abs=1e-6)

    def test_constant_with_warmup(self):
        sched = LRSchedulerFactory(warmup_steps=4, decay="constant").create(0.5)
        assert float(sched(0)) == pytest.approx(0.0)
        assert float(sched(4)) == pytest.approx(0.5)
        assert float(sched(1000)) == pytest.approx(0.5)

    def test_pure_constant(self):
        sched = LRSchedulerFactory().create(0.3)
        assert float(sched(0)) == float(sched(999)) == pytest.approx(0.3)

    def test_composes_with_optimizer(self):
        fac = OptimizerFactory(1e-2)
        sched = LRSchedulerFactory(warmup_steps=2, decay="cosine", total_steps=10).create(
            fac.learning_rate
        )
        opt = fac.create(schedule=sched)
        updates = _apply_once(opt)
        assert np.isfinite(np.asarray(updates["w"])).all()
