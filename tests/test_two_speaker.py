"""Two-speaker synthetic corpus + procedural distillation teacher.

These guard the round-5 A->B conversion experiment's foundations:
(1) the generator's parallel mode really renders the SAME content with two
    procedurally distinct speakers (disjoint f0 ranges, warped formant
    tables), and
(2) the MFCC teacher's feature space aligns frames ACROSS speakers well
    enough for kNN retrieval to mean "conversion" rather than resynthesis
    (the role WavLM plays in the reference, `train_encoder.py:54,79-82`).
"""

import json
import os
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def gen():
    sys.path.insert(0, os.path.join(ROOT, "benchmarks"))
    import gen_synth_dataset

    return gen_synth_dataset


@pytest.fixture(scope="module")
def pair_dirs(gen, tmp_path_factory):
    root = tmp_path_factory.mktemp("two_speaker")
    a, b = str(root / "A"), str(root / "B")
    gen.write_parallel_set(a, b, n_files=2, seconds=5.0, seed=99)
    return a, b


def _load(d, i):
    from tinyvc_tpu.utils.audio_io import load_audio

    w, sr = load_audio(os.path.join(d, f"utt{i:03d}.wav"))
    with open(os.path.join(d, f"utt{i:03d}.json")) as f:
        meta = json.load(f)
    return w.mean(axis=0), sr, meta


def test_parallel_pairs_share_content_but_not_speaker(pair_dirs):
    a_dir, b_dir = pair_dirs
    wa, sr, ma = _load(a_dir, 0)
    wb, _, mb = _load(b_dir, 0)
    assert sr == 24000 and len(wa) == len(wb)
    # same content: vowel ids and span boundaries match exactly
    assert [s["vowel"] for s in ma["vowel_spans"]] == [
        s["vowel"] for s in mb["vowel_spans"]
    ]
    assert [s["start"] for s in ma["vowel_spans"]] == [
        s["start"] for s in mb["vowel_spans"]
    ]
    # different speaker: disjoint f0 ranges...
    f0a = np.array(ma["f0"]); f0a = f0a[f0a > 0]
    f0b = np.array(mb["f0"]); f0b = f0b[f0b > 0]
    assert np.percentile(f0a, 95) < np.percentile(f0b, 5)
    # ...and B's formants warped up by the tract-length scale
    for sa, sb in zip(ma["vowel_spans"], mb["vowel_spans"]):
        assert sb["f1"] == pytest.approx(sa["f1"] * 1.28, rel=1e-6)
        assert sb["f2"] == pytest.approx(sa["f2"] * 1.28, rel=1e-6)


def test_speaker_corpora_have_disjoint_f0(gen, tmp_path):
    a = str(tmp_path / "rawA")
    gen.write_speaker_set(a, "A", n_files=1, seconds=4.0, seed=5)
    b = str(tmp_path / "rawB")
    gen.write_speaker_set(b, "B", n_files=1, seconds=4.0, seed=5)
    _, _, ma = _load(a, 0)
    _, _, mb = _load(b, 0)
    f0a = np.array(ma["f0"]); f0b = np.array(mb["f0"])
    assert f0a[f0a > 0].max() < gen.SPEAKERS["B"]["f0_lo"]
    assert f0b[f0b > 0].min() > gen.SPEAKERS["A"]["f0_hi"]


def test_mfcc_teacher_shape_and_isometry():
    from tinyvc_tpu.train.teacher import MFCCTeacher

    t = MFCCTeacher()
    rng = np.random.default_rng(0)
    w = rng.normal(size=(2, 24000)).astype(np.float32)
    f = t(w)
    assert f.shape == (2, 24000 // 480 + 1, 768) and f.dtype == np.float32
    # the lift is an isometry: pairwise distances in the 768-d space equal
    # distances in the stacked-MFCC space (proj has orthonormal columns)
    assert np.allclose(t.proj.T @ t.proj, np.eye(t.proj.shape[1]), atol=1e-10)


def test_mfcc_teacher_aligns_frames_across_speakers(pair_dirs):
    """Nearest-neighbour frame matching from speaker A into speaker B's
    frames must recover the underlying vowel far above chance — this is
    the property that makes kNN retrieval convert rather than resynthesise."""
    from tinyvc_tpu.train.teacher import MFCCTeacher

    a_dir, b_dir = pair_dirs
    t = MFCCTeacher()
    hop_s = 480 / 24000

    def vowels_of(meta, n):
        v = np.full(n, -1)
        for s in meta["vowel_spans"]:
            lo, hi = int(s["start"] / hop_s), int(s["end"] / hop_s)
            v[lo:min(hi, n)] = s["vowel"]
        return v

    accs = []
    for i in range(2):
        wa, _, ma = _load(a_dir, i)
        wb, _, mb = _load(b_dir, i)
        fa, fb = t(wa[None])[0], t(wb[None])[0]
        va, vb = vowels_of(ma, len(fa)), vowels_of(mb, len(fb))
        f0a = np.array(ma["f0"])
        voiced = np.zeros(len(fa), bool)
        n = min(len(f0a), len(fa))
        voiced[:n] = f0a[:n] > 0
        an = fa / (np.linalg.norm(fa, axis=1, keepdims=True) + 1e-9)
        bn = fb / (np.linalg.norm(fb, axis=1, keepdims=True) + 1e-9)
        nn = (an @ bn.T).argmax(1)
        mask = voiced & (va >= 0)
        accs.append(float((vb[nn[mask]] == va[mask]).mean()))
    # measured ~0.9 for the committed recipe; chance ~0.27. The floor is
    # loose so jitter in tiny test corpora can't flake it.
    assert np.mean(accs) > 0.6, accs
