"""Native C++ components vs their Python reference implementations."""

import numpy as np
import pytest

from mtvaf_tpu.data.tokenization import FullTokenizer
from mtvaf_tpu.native.binding import (NativeWordPiece, load_library,
                                      native_preprocess)

pytestmark = pytest.mark.skipif(load_library() is None,
                                reason="native library not built")


@pytest.fixture(scope="module")
def tokenizer():
    tokens = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "the", "quick", "brown",
              "fox", "jump", "##s", "##ed", "over", "lazy", "dog", "!", ",",
              "un", "##want", "runn", "##ing", "wa"]
    return FullTokenizer({t: i for i, t in enumerate(tokens)})


class TestNativeWordPiece:
    def test_matches_python(self, tokenizer):
        nt = NativeWordPiece(tokenizer)
        cases = [
            ["the", "quick", "Brown", "fox"],
            ["jumps", "over", "the", "LAZY", "dog!"],
            ["unwanted,", "running"],
            ["nonexistentword"],
        ]
        for words in cases:
            ids, starts = nt.encode_words(words)
            # python reference
            py_ids, py_starts = [], []
            for w in words:
                py_starts.append(len(py_ids))
                py_ids.extend(tokenizer.convert_tokens_to_ids(
                    tokenizer.tokenize(w)))
            py_starts.append(len(py_ids))
            assert ids == py_ids, words
            assert starts == py_starts, words

    def test_non_ascii_falls_back(self, tokenizer):
        nt = NativeWordPiece(tokenizer)
        ids, starts = nt.encode_words(["Héllo", "the"])
        py = tokenizer.convert_tokens_to_ids(tokenizer.tokenize("Héllo the"))
        assert ids == py


class TestNativeImageOps:
    def test_matches_python_center_crop(self):
        """Compare on a smooth image: PIL's BILINEAR downscale is
        area-weighted while the native op point-samples — identical on
        smooth content, different on per-pixel noise."""
        from mtvaf_tpu.data.images import _crop, _normalize
        from PIL import Image
        yy, xx = np.mgrid[0:300, 0:400]
        raw = np.stack([(yy * 255 / 300), (xx * 255 / 400),
                        ((yy + xx) * 255 / 700)], axis=-1).astype(np.uint8)

        got = native_preprocess(raw)
        assert got.shape == (224, 224, 3)

        # Python path: PIL resize + center crop + normalize
        im = Image.fromarray(raw)
        w, h = im.size
        if w < h:
            nw, nh = 256, round(h * 256 / w)
        else:
            nh, nw = 256, round(w * 256 / h)
        ref = np.asarray(im.resize((nw, nh), Image.BILINEAR), np.uint8)
        ref = _crop(ref, train=False, rng=None)
        ref = _normalize(ref)
        # bilinear implementations differ slightly at pixel level
        diff = np.abs(got - ref)
        assert np.median(diff) < 0.05
        assert (diff < 0.5).mean() > 0.97

    def test_hflip(self):
        rng = np.random.RandomState(1)
        raw = rng.randint(0, 255, (256, 256, 3), dtype=np.uint8)
        a = native_preprocess(raw, hflip=False)
        b = native_preprocess(raw, hflip=True)
        np.testing.assert_allclose(a, b[:, ::-1], atol=1e-6)

    def test_process_image_uses_native_path(self, tmp_path):
        """Production wiring: process_image routes through the native op
        (use_native=True default) and stays close to the pure-Python path,
        in both eval (center crop) and train (seeded random crop+flip)
        modes; the random draws are made host-side in the same order so a
        seeded run is backend-independent."""
        from PIL import Image
        from mtvaf_tpu.data.images import process_image
        yy, xx = np.mgrid[0:300, 0:400]
        raw = np.stack([(yy * 255 / 300), (xx * 255 / 400),
                        ((yy + xx) * 255 / 700)], axis=-1).astype(np.uint8)
        path = str(tmp_path / "img.png")
        Image.fromarray(raw).save(path)

        nat = process_image(path)
        ref = process_image(path, use_native=False)
        assert nat.shape == ref.shape == (224, 224, 3)
        assert np.median(np.abs(nat - ref)) < 0.05

        nat_t = process_image(path, train=True,
                              rng=np.random.RandomState(7))
        ref_t = process_image(path, train=True,
                              rng=np.random.RandomState(7), use_native=False)
        assert np.median(np.abs(nat_t - ref_t)) < 0.05
        # a different seed draws a different crop
        other = process_image(path, train=True,
                              rng=np.random.RandomState(8))
        assert not np.allclose(nat_t, other)
