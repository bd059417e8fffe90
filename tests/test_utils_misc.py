import numpy as np
import jax
import jax.numpy as jnp

from dust3r_tpu.utils.device import (todevice, to_numpy, to_cpu,
                                     collate_with_cat)
from dust3r_tpu.utils.misc import (is_symmetrized, flip, interleave,
                                   freeze_mask, fill_default_args)
from dust3r_tpu.utils.parallel import parallel_threads
from dust3r_tpu.utils.profiling import PhaseTimer
from dust3r_tpu.training import make_batch_symmetric


class TestDevice:
    def test_todevice_recursive(self):
        x = {"a": jnp.ones(3), "b": [np.zeros(2), "str"], "c": 5}
        out = to_numpy(x)
        assert isinstance(out["a"], np.ndarray)
        assert out["b"][1] == "str" and out["c"] == 5

    def test_collate_with_cat_dicts(self):
        res = collate_with_cat([
            dict(pred1={"pts3d": np.ones((2, 4, 4, 3))}),
            dict(pred1={"pts3d": np.zeros((3, 4, 4, 3))}),
        ])
        assert res["pred1"]["pts3d"].shape == (5, 4, 4, 3)

    def test_collate_with_cat_lists(self):
        res = collate_with_cat([
            dict(x=np.ones((1, 4, 4))), dict(x=np.zeros((1, 2, 2)))],
            lists=True)
        assert isinstance(res["x"], list) and len(res["x"]) == 2


class TestMisc:
    def test_is_symmetrized(self):
        g1 = {"instance": ["0", "1", "2", "3"]}
        g2 = {"instance": ["1", "0", "3", "2"]}
        assert is_symmetrized(g1, g2)
        assert not is_symmetrized({"instance": ["0", "1"]},
                                  {"instance": ["0", "1"]})

    def test_flip_interleave(self):
        x = np.arange(4)
        np.testing.assert_array_equal(flip(x), [1, 0, 3, 2])
        a, b = interleave(np.array([1, 2]), np.array([3, 4]))
        np.testing.assert_array_equal(a, [1, 3, 2, 4])
        np.testing.assert_array_equal(b, [3, 1, 4, 2])

    def test_make_batch_symmetric(self):
        v1 = {"img": np.array([[1.0], [2.0]]), "instance": ["a", "b"]}
        v2 = {"img": np.array([[3.0], [4.0]]), "instance": ["c", "d"]}
        n1, n2 = make_batch_symmetric(v1, v2)
        np.testing.assert_array_equal(n1["img"].ravel(), [1, 3, 2, 4])
        np.testing.assert_array_equal(n2["img"].ravel(), [3, 1, 4, 2])
        assert is_symmetrized(n1, n2)

    def test_freeze_mask_encoder(self):
        params = {"params": {
            "patch_embed": {"proj": {"kernel": jnp.ones((2, 2))}},
            "enc_blocks_0": {"w": jnp.ones(3)},
            "dec_blocks_0": {"w": jnp.ones(3)},
        }}
        mask = freeze_mask(params, "encoder")
        assert float(mask["params"]["patch_embed"]["proj"]["kernel"]) == 0
        assert float(mask["params"]["enc_blocks_0"]["w"]) == 0
        assert float(mask["params"]["dec_blocks_0"]["w"]) == 1
        mask_none = freeze_mask(params, "none")
        assert float(mask_none["params"]["enc_blocks_0"]["w"]) == 1

    def test_fill_default_args(self):
        def f(a, b=2, c=3):
            pass
        kw = fill_default_args({"a": 1, "c": 9}, f)
        assert kw == {"a": 1, "b": 2, "c": 9}


class TestParallel:
    def test_threads_star_args(self):
        res = parallel_threads(lambda a, b: a + b, [(1, 2), (3, 4), (5, 6)],
                               workers=2, star_args=True)
        assert res == [3, 7, 11]


class TestProfiling:
    def test_phase_timer(self):
        t = PhaseTimer()
        with t.phase("a"):
            pass
        with t.phase("a"):
            pass
        s = t.summary()
        assert s["a"]["count"] == 2
