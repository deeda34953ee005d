"""Pallas payload-kernel backend: bit-exactness vs the XLA pre-tiled path
(interpret mode — the compiled Mosaic path is validated on TPU, see
PERFORMANCE.md)."""

import numpy as np
import pytest

from tpu_vpcc.atlas.groups import build_group_table
from tpu_vpcc.ops.pallas_kernels import CHUNK, reconstruct_batch_pallas
from tpu_vpcc.ops.reconstruct import make_config
from tpu_vpcc.ops.tiled import reconstruct_batch_pretiled, tile_plane
from tpu_vpcc.utils.synthetic import make_synthetic_frame


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_matches_xla(seed):
    rng = np.random.default_rng(seed)
    width, res, prec = 128, 8, 4
    sf = make_synthetic_frame(rng, width=width, height=width,
                              occupancy_resolution=res, occupancy_precision=prec,
                              n_patches=4)
    gt = build_group_table(sf.meta)
    cfg = make_config(width=width, height=width, occupancy_resolution=res,
                      occupancy_precision=prec, map_count=2)
    assert cfg.g_cap % CHUNK == 0
    ay = np.stack([p[0] for p in sf.attr_planes])
    au = np.stack([p[1] for p in sf.attr_planes])
    av = np.stack([p[2] for p in sf.attr_planes])
    args = (
        gt.fields[None],
        tile_plane(sf.occ_plane, res // prec)[None],
        tile_plane(sf.geo_planes[0], res)[None],
        tile_plane(sf.geo_planes[1], res)[None],
        tile_plane(ay, res)[None],
        tile_plane(au, res // 2)[None],
        tile_plane(av, res // 2)[None],
    )
    p1, c1, n1 = reconstruct_batch_pretiled(*args, cfg=cfg)
    p2, c2, n2 = reconstruct_batch_pallas(*args, cfg, interpret=True)
    n1, n2 = int(n1[0]), int(n2[0])
    assert n1 == n2 > 0
    np.testing.assert_array_equal(np.asarray(p1)[0][:n1], np.asarray(p2)[0][:n1])
    np.testing.assert_array_equal(np.asarray(c1)[0][:n1], np.asarray(c2)[0][:n1])
