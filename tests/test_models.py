"""Model forward smoke + shape tests on the tiny config."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from uni3detr_tpu.models.detector import Uni3DETR
from tiny import TINY, synth_scene, pad_batch


def _batch(seed=0, B=2):
    rng = np.random.RandomState(seed)
    scenes = [synth_scene(rng) for _ in range(B)]
    return pad_batch(scenes)


@pytest.mark.slow  # train-mode compile of the full detector; train coverage stays in test_train.py
def test_forward_shapes_train():
    pts, pmask, *_ = _batch()
    model = Uni3DETR(TINY)
    rngs = {"params": jax.random.PRNGKey(0)}
    variables = model.init(rngs, jnp.asarray(pts), jnp.asarray(pmask),
                           train=False,
                           random_points=jnp.zeros((2, TINY.num_query, 3)))
    out = model.apply(variables, jnp.asarray(pts), jnp.asarray(pmask),
                      train=True, mutable=["batch_stats"],
                      rngs={"dropout": jax.random.PRNGKey(1)})[0]
    L, nq = TINY.num_decoder_layers, TINY.num_query
    assert out["all_cls_scores"].shape == (L, 2, 3 * nq, TINY.num_classes)
    assert out["all_bbox_preds"].shape == (L, 2, 3 * nq, TINY.code_size)
    assert out["all_iou_preds"].shape == (L, 2, 3 * nq)
    box = np.asarray(out["all_bbox_preds"])
    assert np.isfinite(box).all()
    # centers inside pc_range
    assert (box[..., 0] >= TINY.pc_range[0]).all()
    assert (box[..., 0] <= TINY.pc_range[3]).all()
    assert (box[..., 4] >= TINY.pc_range[2]).all()
    assert (box[..., 4] <= TINY.pc_range[5]).all()


def test_forward_shapes_eval_has_extra_group():
    pts, pmask, *_ = _batch(1)
    model = Uni3DETR(TINY)
    rp = jax.random.uniform(jax.random.PRNGKey(2), (2, TINY.num_query, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(pts), jnp.asarray(pmask),
                           train=False, random_points=rp)
    out = model.apply(variables, jnp.asarray(pts), jnp.asarray(pmask),
                      train=False, random_points=rp)
    L, nq = TINY.num_decoder_layers, TINY.num_query
    assert out["all_cls_scores"].shape == (L, 2, 4 * nq, TINY.num_classes)


def test_cross_atten_rejects_multi_point():
    """num_points>1 is unimplemented (the reference's extra attention
    weights would be silently dropped); must fail loudly (VERDICT r4 #7)."""
    import pytest
    from uni3detr_tpu.models.transformer import UniCrossAtten
    m = UniCrossAtten(embed_dim=8, num_points=2)
    x = jnp.zeros((1, 1, 4, 8))
    vol = jnp.zeros((1, 2, 2, 2, 8))
    ref = jnp.zeros((1, 1, 4, 3))
    with pytest.raises(NotImplementedError):
        m.init(jax.random.PRNGKey(0), x, x, vol, ref, False)
