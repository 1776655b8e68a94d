import jax
import jax.numpy as jnp
import numpy as np

from x_detector_tpu.train import losses as L


def test_smooth_l1_known_values():
    # sigma=1: 0.5*x^2 below 1, |x|-0.5 above
    got = np.asarray(L.smooth_l1(jnp.array([[0.5, 2.0, -3.0, 0.0]]),
                                 jnp.zeros((1, 4)), sigma=1.0))
    np.testing.assert_allclose(got, [0.125 + 1.5 + 2.5 + 0.0], atol=1e-6)
    # sigma=3: cutoff 1/9
    got = np.asarray(L.smooth_l1(jnp.array([[0.05]]), jnp.zeros((1, 1)),
                                 sigma=3.0))
    np.testing.assert_allclose(got, [0.5 * (3 * 0.05) ** 2], atol=1e-7)
    got = np.asarray(L.smooth_l1(jnp.array([[1.0]]), jnp.zeros((1, 1)),
                                 sigma=3.0))
    np.testing.assert_allclose(got, [1.0 - 0.5 / 9.0], atol=1e-6)


def test_softmax_ce_matches_manual():
    logits = jnp.array([[1.0, 2.0, 0.5], [0.0, 0.0, 0.0]])
    labels = jnp.array([1, 2])
    got = np.asarray(L.softmax_ce(logits, labels))
    manual = -np.log(np.exp([2.0, 0.0]) /
                     np.array([np.exp([1.0, 2.0, 0.5]).sum(), 3.0]))
    np.testing.assert_allclose(got, manual, rtol=1e-6)


def test_rank_of():
    vals = jnp.array([0.1, 0.9, 0.5, 0.7])
    rank = np.asarray(L._rank_of(vals))
    assert rank.tolist() == [3, 0, 2, 1]


def test_rpn_minibatch_balances():
    key = jax.random.PRNGKey(0)
    fg = jnp.zeros(5000, bool).at[:300].set(True)
    bg = ~fg
    w = np.asarray(L.sample_rpn_minibatch(key, fg, bg, 256, 0.5))
    assert w.sum() == 256
    assert w[:300].sum() == 128          # capped positives
    assert w[300:].sum() == 128


def test_rpn_minibatch_few_positives():
    key = jax.random.PRNGKey(1)
    fg = jnp.zeros(5000, bool).at[:10].set(True)
    bg = ~fg
    w = np.asarray(L.sample_rpn_minibatch(key, fg, bg, 256, 0.5))
    assert w.sum() == 256
    assert w[:10].sum() == 10            # all positives kept
    assert w[10:].sum() == 246


def test_rpn_loss_finite_and_components():
    key = jax.random.PRNGKey(0)
    a = 600
    cls = jax.random.normal(key, (a, 2))
    loc = jax.random.normal(key, (a, 4))
    fg = jnp.zeros(a, bool).at[:20].set(True)
    bg = jnp.zeros(a, bool).at[100:].set(True)
    targets = jnp.zeros((a, 4))
    total, m = L.rpn_loss(key, cls, loc, fg, bg, targets)
    assert np.isfinite(float(total))
    assert float(m["rpn_num_fg"]) == 20


def test_ssd_loss_mining_ratio():
    a = 1000
    labels = jnp.zeros(a, jnp.int32).at[:10].set(5)
    fg = labels > 0
    logits = jnp.zeros((a, 21))
    codes = jnp.zeros((a, 4))
    targets = jnp.zeros((a, 4))
    total, m = L.ssd_loss(logits, codes, labels, targets, fg,
                          neg_pos_ratio=3.0)
    # uniform logits: CE = log(21) for everyone; 10 fg + 30 hard neg / 10
    expected_cls = np.log(21.0) * 40 / 10
    np.testing.assert_allclose(float(m["ssd_cls_loss"]), expected_cls,
                               rtol=1e-5)
    np.testing.assert_allclose(float(m["ssd_loc_loss"]), 0.0, atol=1e-7)
    assert float(m["ssd_num_fg"]) == 10


def test_ssd_loss_no_positives():
    a = 100
    labels = jnp.zeros(a, jnp.int32)
    fg = labels > 0
    total, m = L.ssd_loss(jax.random.normal(jax.random.PRNGKey(0), (a, 21)),
                          jnp.zeros((a, 4)), labels, jnp.zeros((a, 4)), fg)
    assert np.isfinite(float(total))
    assert float(m["ssd_num_fg"]) == 0


def test_ohem_selects_hardest():
    r = 50
    cls = jnp.zeros((r, 21))
    # make roi 7 catastrophically wrong: huge logit on wrong class
    cls = cls.at[7, 3].set(-50.0).at[7, 0].set(50.0)
    labels = jnp.zeros(r, jnp.int32).at[7].set(3)
    box = jnp.zeros((r, 4))
    targets = jnp.zeros((r, 4))
    fg = jnp.zeros(r, bool).at[7].set(True)
    valid = jnp.ones(r, bool)
    # keep only top-1 hardest -> loss dominated by roi 7's CE (~100)
    total, m = L.roi_loss_ohem(cls, box, labels, targets, fg, valid,
                               ohem_topk=1)
    assert float(total) > 50.0
    # with k = all, the mean dilutes it
    total_all, _ = L.roi_loss_ohem(cls, box, labels, targets, fg, valid,
                                   ohem_topk=50)
    assert float(total_all) < float(total)


def test_ohem_ignores_invalid():
    r = 10
    cls = jnp.zeros((r, 21)).at[0, 0].set(-100.0)  # huge loss on roi 0
    labels = jnp.zeros(r, jnp.int32)
    valid = jnp.ones(r, bool).at[0].set(False)     # ...but it's padding
    total, _ = L.roi_loss_ohem(cls, jnp.zeros((r, 4)), labels,
                               jnp.zeros((r, 4)), jnp.zeros(r, bool), valid,
                               ohem_topk=5)
    np.testing.assert_allclose(float(total), np.log(21.0), rtol=1e-4)


def test_roi_loss_per_class_box_gathers_target_slice():
    """roi_box [R, C, 4] (class_agnostic_box=False): the loss must train the
    slice at the target class, i.e. equal the class-agnostic loss computed on
    those gathered slices."""
    r, c = 6, 5
    rng = np.random.default_rng(3)
    cls = jnp.asarray(rng.normal(size=(r, c)), jnp.float32)
    box_pc = jnp.asarray(rng.normal(size=(r, c, 4)), jnp.float32)
    labels = jnp.asarray([1, 2, 0, 4, 0, 3], jnp.int32)
    targets = jnp.asarray(rng.normal(size=(r, 4)), jnp.float32)
    fg = labels > 0
    valid = jnp.ones((r,), bool)

    total_pc, _ = L.roi_loss_ohem(cls, box_pc, labels, targets, fg, valid,
                                  ohem_topk=r)
    gathered = box_pc[jnp.arange(r), labels]
    total_ag, _ = L.roi_loss_ohem(cls, gathered, labels, targets, fg, valid,
                                  ohem_topk=r)
    np.testing.assert_allclose(float(total_pc), float(total_ag), rtol=1e-6)
