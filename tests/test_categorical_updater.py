"""CategoricalItemSketchUpdater == generic SketchUpdater, bit for bit."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from associationabacminer_ray.sources.transcripts import synth_transcripts
from associationabacminer_ray.stages.sketch_update import (
    CategoricalItemSketchUpdater,
    SketchSpec,
    SketchUpdater,
    merge_sketch_partials,
)


def test_categorical_equals_generic(ray_session):
    import ray.data as rd

    tbl = synth_transcripts(2000, seed=9)
    ds = rd.from_arrow(tbl)

    def add_item(t: pa.Table) -> pa.Table:
        item = pc.binary_join_element_wise(t["role"], t["tool"], "=")
        return pa.table({"conv_id": t["conv_id"], "item": item})

    specs = [
        SketchSpec("item_cms", "cms", "item", width=1 << 12, depth=3),
        SketchSpec("item_topk", "topk", "item", capacity=512),
        SketchSpec("conv_hll", "hll", "conv_id", p=12),
    ]
    generic = merge_sketch_partials(
        ds.map_batches(add_item, batch_format="pyarrow")
        .map_batches(SketchUpdater(specs), batch_format="pyarrow", batch_size=4096))
    fast = merge_sketch_partials(
        ds.map_batches(CategoricalItemSketchUpdater(
            cms_width=1 << 12, cms_depth=3, topk_capacity=512, hll_p=12),
            batch_format="pyarrow", batch_size=4096))
    assert fast["item_cms"].to_bytes() == generic["item_cms"].to_bytes()
    assert fast["conv_hll"].to_bytes() == generic["conv_hll"].to_bytes()
    assert fast["item_topk"].top(50) == generic["item_topk"].top(50)
