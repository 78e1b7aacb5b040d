"""Activation tests for the two env-blocked real kernels (VERDICT r4 item 7).

Both kernels ship real plumbing behind clean seams with deterministic stubs
standing in for the heavy dependency:

- pixel decode (S-08): `operators/multimodal.decode_image_pixels` resolves
  cv2/PIL at call time (reference behavior: cv2.imdecode at
  projects/vehicle_count/scripts/vehicle_consumer.py:78-111);
- ABSA inference (D-02): `operators/inference.load_model` returns the
  md5-stub model (reference behavior: torch forward pass at
  projects/absa_streaming/scripts/consumer_postgres_streaming.py:74-91).

These tests skip cleanly while the sandbox lacks cv2/PIL/torch, and the
moment a future environment grows them they exercise the REAL path
end-to-end against the stub's schema contract — proving the stub→real swap
is schema-stable with zero engine-code change.
"""

from __future__ import annotations

import importlib.util

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_HAS_IMAGE = any(importlib.util.find_spec(m) for m in ("cv2", "PIL"))
_HAS_TORCH = importlib.util.find_spec("torch") is not None


def _png_bytes(width: int, height: int, value: int) -> bytes:
    """Encode a constant-valued RGB image with whichever backend exists."""
    try:
        import cv2
        import numpy as np

        arr = np.full((height, width, 3), value, dtype=np.uint8)
        ok, buf = cv2.imencode(".png", arr)
        assert ok
        return bytes(buf.tobytes())
    except ImportError:
        import io

        from PIL import Image

        img = Image.new("RGB", (width, height), (value, value, value))
        out = io.BytesIO()
        img.save(out, format="PNG")
        return out.getvalue()


@pytest.mark.skipif(not _HAS_IMAGE, reason="pixel decode needs cv2 or PIL (env-blocked)")
def test_real_pixel_decode_end_to_end(spark):
    """S-08 real path: encode known images, run the real mapInPandas decode,
    assert the declared DECODED_PIXELS_SCHEMA and exact geometry/intensity."""
    from bigdata_streaming_absa_vehicle_spark.operators.multimodal import (
        DECODED_PIXELS_SCHEMA,
        decode_image_pixels,
    )

    rows = [(1, _png_bytes(8, 4, 0)), (2, _png_bytes(16, 2, 255)), (3, _png_bytes(3, 3, 128))]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = decode_image_pixels(media)
    assert out.schema == StructType.fromDDL(DECODED_PIXELS_SCHEMA)
    got = {r["doc_id"]: r for r in out.collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["n_channels"]) == (8, 4, 3)
    assert (got[2]["width"], got[2]["height"]) == (16, 2)
    assert got[1]["mean_intensity"] == 0.0
    assert got[2]["mean_intensity"] == 255.0
    assert abs(got[3]["mean_intensity"] - 128.0) < 1e-9


@pytest.mark.skipif(not _HAS_IMAGE, reason="pixel decode needs cv2 or PIL (env-blocked)")
def test_real_pixel_decode_agrees_with_meta_stub_on_ids(spark):
    """The real decode must keep the stub's row contract: same doc_ids out,
    one row per decodable payload — so swapping stub→real changes VALUES,
    never the pipeline graph around it."""
    from bigdata_streaming_absa_vehicle_spark.operators.multimodal import (
        decode_image_meta,
        decode_image_pixels,
    )

    rows = [(i, _png_bytes(4 + i, 4, 10 * i)) for i in range(1, 6)]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    real_ids = sorted(r["doc_id"] for r in decode_image_pixels(media).collect())
    stub_ids = sorted(r["doc_id"] for r in decode_image_meta(media).collect())
    assert real_ids == stub_ids == [1, 2, 3, 4, 5]


@pytest.mark.skipif(
    importlib.util.find_spec("PIL") is None,
    reason="paletted-PNG rung parity needs PIL (env-blocked)",
)
def test_pil_rung_matches_pure_rung_on_paletted_and_bilevel():
    """Cross-rung parity for the types the vendored codec gained in r8:
    the PIL rung must return looked-up PLTE colors for mode-P payloads
    (raw np.asarray would return the index plane) and 0/255 uint8 for
    1-bit payloads (raw asarray yields dtype bool) — the per-pixel
    readouts must not depend on which library is installed."""
    import numpy as np
    import PIL.Image

    from bigdata_streaming_absa_vehicle_spark.operators.multimodal import (
        _decode_to_array,
    )
    from bigdata_streaming_absa_vehicle_spark.operators import imagecodec
    from bigdata_streaming_absa_vehicle_spark.operators.pngcodec import (
        encode_png,
        encode_png_indexed,
    )

    rng = np.random.default_rng(4)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (6, 9), dtype=np.uint8)
    paletted = encode_png_indexed(9, 6, idx.tobytes(), pal, depth=4)
    theirs = _decode_to_array("pil", PIL.Image, paletted)
    ours = _decode_to_array("pure", imagecodec, paletted)
    assert theirs.dtype == np.uint8 and theirs.shape == (6, 9, 3)
    assert np.array_equal(theirs, ours)

    bits = rng.integers(0, 2, (5, 11), dtype=np.uint8)
    bilevel = encode_png(11, 5, bits.tobytes(), channels=1, depth=1)
    theirs = _decode_to_array("pil", PIL.Image, bilevel)
    ours = _decode_to_array("pure", imagecodec, bilevel)
    assert theirs.dtype == np.uint8
    assert np.array_equal(theirs, ours)


def test_pure_rung_decodes_paletted_and_subbyte_in_operator(spark):
    """The Spark-side decode operator handles the r8/r9 PNG additions
    through the pure rung with NO cv2/PIL: paletted payloads decode to
    their looked-up RGB mean, 1-bit greyscale to the exact 0/255 mean,
    and a 16-bit grey payload decodes under the MSB output contract
    (r9 — previously env-gated and asserted to drop)."""
    import numpy as np

    from bigdata_streaming_absa_vehicle_spark.operators.multimodal import (
        decode_image_pixels,
    )
    from bigdata_streaming_absa_vehicle_spark.operators.pngcodec import (
        encode_png,
        encode_png_indexed,
    )

    pal = [(10, 20, 30), (200, 100, 0)]
    idx = np.array([[0, 1, 1, 0], [1, 1, 0, 0]], np.uint8)
    bits = np.array([[1, 0, 1], [0, 0, 1]], np.uint8)
    deep16 = np.array([[0x1234, 0xABCD]], np.uint16)  # MSBs 0x12, 0xAB
    rows = [
        (1, encode_png_indexed(4, 2, idx.tobytes(), pal, depth=1, interlace=True)),
        (2, encode_png(3, 2, bits.tobytes(), channels=1, depth=1, filters=2)),
        (3, encode_png(2, 1, deep16.astype(">u2").tobytes(), channels=1, depth=16)),
    ]
    media = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in decode_image_pixels(media).collect()}
    assert sorted(got) == [1, 2, 3]
    exp_pal = np.asarray(pal, np.uint8)[idx]
    assert (got[1]["width"], got[1]["height"], got[1]["n_channels"]) == (4, 2, 3)
    assert got[1]["mean_intensity"] == int(exp_pal.sum()) / exp_pal.size
    assert (got[2]["width"], got[2]["height"], got[2]["n_channels"]) == (3, 2, 1)
    assert got[2]["mean_intensity"] == 255 * 3 / 6
    assert (got[3]["width"], got[3]["height"], got[3]["n_channels"]) == (2, 1, 1)
    assert got[3]["mean_intensity"] == (0x12 + 0xAB) / 2


@pytest.mark.skipif(not _HAS_TORCH, reason="real ABSA inference needs torch (env-blocked)")
def test_real_torch_model_satisfies_stub_contract(spark):
    """D-02 real path: a torch-backed model implementing the same
    `predict(texts) -> DataFrame` seam as StubAbsaModel must produce the
    SAME schema through the same Arrow-batched pandas_udf plumbing — the
    stub→real swap is a load_model edit, not a pipeline change.

    The test model is a fixed-weight linear scorer (deterministic, no
    downloaded weights) standing where PhoBERT/XLM-R would load
    (reference: consumer_postgres_streaming.py:74-91)."""
    import hashlib

    import pandas as pd
    import torch

    from bigdata_streaming_absa_vehicle_spark.operators.inference import load_model
    from bigdata_streaming_absa_vehicle_spark.schemas import (
        ABSA_ASPECTS,
        ABSA_NUM_CLASSES,
    )

    class TorchAbsaModel:
        """Same contract as StubAbsaModel: predict(texts) -> one int class
        column per aspect, ids in range(ABSA_NUM_CLASSES)."""

        version = "torch-test"

        def __init__(self) -> None:
            torch.manual_seed(0)
            self.w = torch.randn(8, ABSA_NUM_CLASSES)

        def _features(self, text: str, aspect: str) -> torch.Tensor:
            h = int(hashlib.md5(f"{aspect}:{text}".encode()).hexdigest()[:2], 16)
            return torch.tensor([(h >> i) & 1 for i in range(8)], dtype=torch.float32)

        def predict(self, texts: pd.Series) -> pd.DataFrame:
            cols = {}
            for aspect in ABSA_ASPECTS:
                with torch.no_grad():
                    logits = torch.stack([self._features(t, aspect) for t in texts]) @ self.w
                    cols[aspect] = logits.argmax(dim=1).tolist()
            return pd.DataFrame(cols, index=texts.index)

    texts = pd.Series(["great phone", "bad battery", "ok screen"])
    stub_out = load_model("v0").predict(texts)
    real_out = TorchAbsaModel().predict(texts)
    # identical frame contract: columns, shape, label-id vocabulary
    assert list(real_out.columns) == list(stub_out.columns) == list(ABSA_ASPECTS)
    assert real_out.shape == stub_out.shape
    assert real_out.isin(range(ABSA_NUM_CLASSES)).all().all()

    # and through the engine's Arrow plumbing: same output type as the
    # stub-backed pandas_udf path
    model = TorchAbsaModel()
    first_aspect = ABSA_ASPECTS[0]

    @F.pandas_udf("int")
    def torch_pred(texts: pd.Series) -> pd.Series:
        return model.predict(texts)[first_aspect]

    df = spark.createDataFrame([(1, "great phone")], "id long, text string")
    out = df.withColumn("pred", torch_pred(F.col("text")))
    row = out.collect()[0]
    assert row["pred"] in range(ABSA_NUM_CLASSES)
    assert dict(out.dtypes)["pred"] == "int"


try:
    _HAS_PROTOBUF = importlib.util.find_spec("google.protobuf") is not None
except ModuleNotFoundError:  # parent package 'google' absent entirely
    _HAS_PROTOBUF = False


@pytest.mark.skipif(
    not _HAS_PROTOBUF,
    reason="transformWithStateInPandas driver worker needs google.protobuf (env-blocked)",
)
def test_transform_with_state_running_totals(spark, tmp_path):
    """T-10 successor API: the transformWithStateInPandas running totals
    must equal the hash-checked batch twin once the stream drains — the
    same stream≡batch contract as test_running_totals_stateful, on the
    Spark 4 StatefulProcessor/ValueState API (which needs protobuf for its
    state protocol and RocksDB for its store)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from bigdata_streaming_absa_vehicle_spark.streaming.event_time import (
        running_totals_tws,
    )

    src = tmp_path / "in"
    src.mkdir()
    pd.DataFrame({"user_id": [1, 1, 2], "value": [1.25, 2.0, 3.5]}).to_parquet(
        src / "a.parquet"
    )
    pd.DataFrame({"user_id": [1, 2, 2], "value": [0.75, 1.0, 0.125]}).to_parquet(
        src / "b.parquet"
    )
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema("user_id long, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = (
            running_totals_tws(stream)
            .writeStream.format("memory")
            .queryName("tws_totals")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        # update mode: take each user's LAST emitted row = final totals
        got = {
            r["user_id"]: (r["n_events"], r["total_value"])
            for r in spark.sql(
                "select * from tws_totals order by n_events"
            ).collect()
        }
        batch = running_totals_tws(spark.read.parquet(str(src)))
        exp = {
            r["user_id"]: (r["n_events"], r["total_value"]) for r in batch.collect()
        }
        assert got == exp
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


@pytest.mark.skipif(
    importlib.util.find_spec("cv2") is None,
    reason="deep-readout rung parity needs cv2 (env-blocked)",
)
def test_cv2_rung_matches_pure_rung_on_deep_samples():
    """Cross-rung parity for the r10 full-precision readout: cv2's
    IMREAD_UNCHANGED must return the SAME uint16 samples (after the BGR
    unswizzle) as the vendored decode_image_deep for 16-bit PNG (native
    cv2 decode) and 2-byte PGM payloads (pre-routed to the vendored codec
    since r11 — maxval declares the precision, cv2 reads raw CV_16U;
    at maxval 65535 the two conventions agree, so this also guards the
    routing being value-neutral there)."""
    import cv2
    import numpy as np

    from bigdata_streaming_absa_vehicle_spark.operators import imagecodec
    from bigdata_streaming_absa_vehicle_spark.operators.multimodal import (
        _decode_to_array_deep,
    )
    from bigdata_streaming_absa_vehicle_spark.operators.pngcodec import encode_png

    rng = np.random.default_rng(10)
    img = rng.integers(0, 65536, (6, 9, 3), dtype=np.uint16)
    payload = encode_png(9, 6, img.astype(">u2").tobytes(), channels=3, depth=16)
    theirs = _decode_to_array_deep("cv2", cv2, payload)
    ours = _decode_to_array_deep("pure", imagecodec, payload)
    assert theirs is not None and ours is not None
    assert theirs[1] == ours[1] == 16
    assert theirs[0].dtype == np.uint16
    assert np.array_equal(theirs[0], ours[0])

    grey = rng.integers(0, 65536, (4, 5), dtype=np.uint16)
    pgm = b"P5\n5 4\n65535\n" + grey.astype(">u2").tobytes()
    theirs = _decode_to_array_deep("cv2", cv2, pgm)
    ours = _decode_to_array_deep("pure", imagecodec, pgm)
    assert theirs is not None and ours is not None
    assert theirs[1] == ours[1] == 16
    assert np.array_equal(theirs[0], ours[0])


@pytest.mark.skipif(
    importlib.util.find_spec("PIL") is None,
    reason="deep-readout rung parity needs PIL (env-blocked)",
)
def test_pil_rung_matches_pure_rung_on_deep_samples():
    """16-bit PNGs on the PIL rung pre-route to the vendored codec (r11,
    ADVICE r10 item 1: Pillow has no 16-bit RGB mode and silently opens
    16-bit color PNGs as 8-bit "RGB") — with PIL actually installed, the
    ladder must still report bit_depth 16 and verbatim samples for BOTH
    grey and color payloads, same as the pure rung."""
    import numpy as np
    import PIL.Image

    from bigdata_streaming_absa_vehicle_spark.operators import imagecodec
    from bigdata_streaming_absa_vehicle_spark.operators.multimodal import (
        _decode_to_array_deep,
    )
    from bigdata_streaming_absa_vehicle_spark.operators.pngcodec import encode_png

    rng = np.random.default_rng(11)
    grey = rng.integers(0, 65536, (7, 3), dtype=np.uint16)
    payload = encode_png(3, 7, grey.astype(">u2").tobytes(), channels=1, depth=16)
    theirs = _decode_to_array_deep("pil", PIL.Image, payload)
    ours = _decode_to_array_deep("pure", imagecodec, payload)
    assert theirs is not None and ours is not None
    assert theirs[1] == ours[1] == 16
    assert np.array_equal(np.asarray(theirs[0]), ours[0].reshape(7, 3))

    rgb = rng.integers(0, 65536, (4, 5, 3), dtype=np.uint16)
    payload = encode_png(5, 4, rgb.astype(">u2").tobytes(), channels=3, depth=16)
    theirs = _decode_to_array_deep("pil", PIL.Image, payload)
    assert theirs is not None and theirs[1] == 16  # NOT PIL's 8-bit view
    assert np.array_equal(theirs[0], rgb)


@pytest.mark.skipif(
    importlib.util.find_spec("cv2") is None,
    reason="paletted/32-bpp BMP rung parity needs cv2 (env-blocked)",
)
def test_cv2_rung_matches_pure_rung_on_widened_bmp():
    """Cross-rung parity for the r10 BMP widening: cv2.imdecode must return
    the same looked-up RGB (paletted 8-bpp) and RGBA (32-bpp) pixels as the
    vendored decoder."""
    import struct

    import cv2
    import numpy as np

    from bigdata_streaming_absa_vehicle_spark.operators import imagecodec
    from bigdata_streaming_absa_vehicle_spark.operators.multimodal import (
        _decode_to_array,
    )

    def bmp(width, height, bpp, raster_rows, palette=(), clr_used=0):
        table = b"".join(bytes((b, g, r, 0)) for (r, g, b) in palette)
        data_offset = 14 + 40 + len(table)
        raster = b"".join(raster_rows[::-1])
        header = struct.pack(
            "<2sIHHI", b"BM", data_offset + len(raster), 0, 0, data_offset
        )
        dib = struct.pack(
            "<IiiHHIIiiII", 40, width, height, 1, bpp, 0, len(raster),
            2835, 2835, clr_used, 0,
        )
        return header + dib + table + raster

    pal = [(250, 1, 2), (3, 252, 4), (5, 6, 254), (9, 9, 9)]
    paletted = bmp(3, 2, 8, [bytes((0, 1, 2, 0)), bytes((3, 3, 0, 0))], pal, 4)
    theirs = _decode_to_array("cv2", cv2, paletted)
    ours = _decode_to_array("pure", imagecodec, paletted)
    assert theirs is not None and ours is not None
    assert np.array_equal(theirs, ours)

    argb = bmp(2, 2, 32, [bytes(range(8)), bytes(range(8, 16))])
    theirs = _decode_to_array("cv2", cv2, argb)
    ours = _decode_to_array("pure", imagecodec, argb)
    assert theirs is not None and ours is not None
    assert theirs.shape == ours.shape == (2, 2, 4)
    assert np.array_equal(theirs, ours)
