"""Synthetic dataset generator in the reference file formats.

The Twitter2015/2017 data is not redistributable with the repo, so tests and
benchmarks generate structurally identical data: pipeline-A ``word=TAG``
files (reference models/utils.py:697-705), pipeline-B ``IMGID:`` TSV with ANP
JSON (modules/dataset.py:150-209), AGN/merge aux-text files, and random
images.
"""

from __future__ import annotations

import json
import os
import random
from typing import Dict, List, Optional, Tuple

WORDS = ("the phone screen battery camera service staff food pizza room view "
         "great awful nice slow fast friendly rude amazing terrible crisp "
         "blurry loud quiet warm cold fresh stale I we they it was is are "
         "really very so and but with at on in of for").split()
POLAR = ["POS", "NEG", "NEU"]
CRF_TYPES = ["POS", "NEG", "NEU"]


def _sentence(rng: random.Random, n_words: int) -> List[str]:
    return [rng.choice(WORDS) for _ in range(n_words)]


def make_span_file(path: str, n: int, *, seed: int = 0, max_len: int = 16,
                   image_ids: Optional[List[str]] = None) -> None:
    rng = random.Random(seed)
    lines = []
    for i in range(n):
        length = rng.randint(5, max_len)
        words = _sentence(rng, length)
        tags = ["O"] * length
        n_terms = rng.randint(1, min(2, length // 3))
        used = set()
        for _ in range(n_terms):
            start = rng.randint(0, length - 2)
            width = rng.randint(1, 2)
            span = set(range(start, min(start + width, length)))
            if span & used:
                continue
            used |= span
            pol = rng.choice(POLAR)
            tags[start] = f"T-{pol}-B"
            for j in range(start + 1, min(start + width, length)):
                tags[j] = f"T-{pol}"
        img = image_ids[i % len(image_ids)] if image_ids else f"img_{i}.jpg"
        pair_str = " ".join(f"{w}={t}" for w, t in zip(words, tags))
        sent = " ".join(words)
        lines.append(f"{sent}####{pair_str}____label=[1, 0]____imgid=['{img}']")
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")


def make_crf_files(tsv_path: str, anp_path: str, n: int, *, seed: int = 0,
                   max_len: int = 14, num_anp: int = 16,
                   image_ids: Optional[List[str]] = None) -> None:
    rng = random.Random(seed)
    lines = []
    anp: Dict[str, Dict[str, float]] = {}
    for i in range(n):
        img = (image_ids[i % len(image_ids)] if image_ids
               else f"{700000 + i}.jpg")
        lines.append("IMGID:" + img[:-4])
        length = rng.randint(4, max_len)
        words = _sentence(rng, length)
        tags = ["O"] * length
        start = rng.randint(0, length - 2)
        width = rng.randint(1, 2)
        t = rng.choice(CRF_TYPES)
        tags[start] = f"B-{t}"
        for j in range(start + 1, min(start + width, length)):
            tags[j] = f"I-{t}"
        for w, tag in zip(words, tags):
            lines.append(f"{w}\t{tag}")
        lines.append("")
        dist = [rng.random() for _ in range(num_anp)]
        s = sum(dist)
        anp[img] = {f"anp_{k:04d}": v / s for k, v in enumerate(dist)}
    with open(tsv_path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    with open(anp_path, "w", encoding="utf-8") as f:
        json.dump(anp, f)


def make_merge_file(path: str, image_ids: List[str], *, seed: int = 0) -> None:
    rng = random.Random(seed)
    with open(path, "w", encoding="utf-8") as f:
        for img in image_ids:
            ctx = " ".join(_sentence(rng, rng.randint(3, 8)))
            f.write(f"{img} [SEP] {ctx}\n")


def make_agn_file(path: str, image_ids: List[str], *, seed: int = 0) -> None:
    rng = random.Random(seed)
    with open(path, "w", encoding="utf-8") as f:
        for img in image_ids:
            aux = " ".join(_sentence(rng, rng.randint(2, 5)))
            f.write(f"{img} {aux}\n")


def make_images(img_dir: str, image_ids: List[str], *, size: int = 256,
                seed: int = 0) -> None:
    import numpy as np
    from PIL import Image
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    for img in image_ids:
        arr = rng.randint(0, 255, (size, size, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, img))


NOUNS = "phone screen battery camera service staff food pizza room view".split()
POS_WORDS = "great amazing nice friendly fresh".split()
NEG_WORDS = "awful terrible slow rude stale".split()
FILLER = "the was is really very so and it I".split()


def make_learnable_span_file(path: str, n: int, *, seed: int = 0) -> None:
    """Synthetic data with a *learnable* rule: each sentence contains one
    aspect noun preceded by a sentiment word that determines its polarity —
    lets integration tests assert that training actually learns."""
    rng = random.Random(seed)
    lines = []
    for i in range(n):
        noun = rng.choice(NOUNS)
        positive = rng.random() < 0.5
        sent_word = rng.choice(POS_WORDS if positive else NEG_WORDS)
        pol = "POS" if positive else "NEG"
        pre = [rng.choice(FILLER) for _ in range(rng.randint(1, 3))]
        post = [rng.choice(FILLER) for _ in range(rng.randint(0, 2))]
        words = pre + [sent_word, noun] + post
        tags = ["O"] * len(pre) + ["O", f"T-{pol}-B"] + ["O"] * len(post)
        pair_str = " ".join(f"{w}={t}" for w, t in zip(words, tags))
        lines.append(f"{' '.join(words)}####{pair_str}"
                     f"____label=[1, 0]____imgid=['img_{i % 4}.jpg']")
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")


def make_learnable_crf_files(tsv_path: str, anp_path: str, n: int, *,
                             seed: int = 0, num_anp: int = 8) -> None:
    """CRF-pipeline variant of the learnable rule."""
    rng = random.Random(seed)
    lines = []
    anp: Dict[str, Dict[str, float]] = {}
    for i in range(n):
        img = f"{800000 + (i % 4)}.jpg"
        lines.append("IMGID:" + img[:-4])
        noun = rng.choice(NOUNS)
        positive = rng.random() < 0.5
        sent_word = rng.choice(POS_WORDS if positive else NEG_WORDS)
        t = "POS" if positive else "NEG"
        pre = [rng.choice(FILLER) for _ in range(rng.randint(1, 3))]
        words = pre + [sent_word, noun]
        tags = ["O"] * len(pre) + ["O", f"B-{t}"]
        for w, tag in zip(words, tags):
            lines.append(f"{w}\t{tag}")
        lines.append("")
        dist = [rng.random() for _ in range(num_anp)]
        s = sum(dist)
        anp[img] = {f"anp_{k:04d}": v / s for k, v in enumerate(dist)}
    with open(tsv_path, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    with open(anp_path, "w", encoding="utf-8") as f:
        json.dump(anp, f)


def make_roberta_vocab(dir_path: str) -> None:
    """Tiny byte-level BPE vocab (vocab.json + merges.txt) covering the
    synthetic word list: specials + single characters + a few merges."""
    import string
    os.makedirs(dir_path, exist_ok=True)
    tokens = ["<s>", "<pad>", "</s>", "<unk>", "<mask>"]
    tokens += list(string.ascii_lowercase) + list(string.ascii_uppercase)
    tokens += list(string.digits) + list("!#=',.?[]()-_/")
    tokens += ["Ġ"]                       # 'Ġ' space marker
    tokens += ["Ġ" + c for c in string.ascii_lowercase]
    merges = [f"Ġ {c}" for c in string.ascii_lowercase]
    vocab = {t: i for i, t in enumerate(dict.fromkeys(tokens))}
    with open(os.path.join(dir_path, "vocab.json"), "w", encoding="utf-8") as f:
        json.dump(vocab, f)
    with open(os.path.join(dir_path, "merges.txt"), "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n" + "\n".join(merges) + "\n")


def make_vocab_file(path: str) -> None:
    """Small WordPiece vocab covering the synthetic word list."""
    specials = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    pieces = sorted(set(WORDS))
    subwords = sorted({w[:3] for w in pieces if len(w) > 3} |
                      {"##" + w[3:] for w in pieces if len(w) > 3})
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(specials + pieces + subwords) + "\n")
