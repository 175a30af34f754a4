#!/usr/bin/env python
"""Generate the repo's self-contained test/bench fixture corpus.

Role parity with the reference's committed fixture set
(``test/integration/fixtures/`` + ``create_fixtures.py`` there): a small
deterministic corpus of wavs, HTK labels, question file, and derived
features that the test suite and ``bench.py`` run on WITHOUT the
read-only reference mount.

Unlike the reference (which commits 9 LJSpeech + 9 VCTK recordings), the
corpus here is *synthesised from known parameters* by the framework's
own WORLD-style harmonic+noise kernel: each utterance is built from a
phone sequence with per-phone formant targets, an F0 contour, and a
voicing pattern — so tests can verify feature extraction against the
true generating parameters, not just against another extractor.

Layout written under ``tests/fixtures/`` (mirrors the reference layout
so the same test code paths cover both):

    file_id_list.txt
    questions-gen_dnn.hed              generated QS/CQS question set
    database/wav/<id>.wav              16 kHz PCM16
    database/wav48/<id>.wav            48 kHz PCM16
    labels/label_state_align/<id>.lab  HTK full-context, 5 states/phone
    labels/full/<id>.lab               phone-level full-context
    labels/mono_no_align/<id>.lab      plain phone-per-line
    labels/mfa/<id>.TextGrid           MFA-style alignment
    labels/mono_phone.list             phone set
    dur/<id>.dur                       float32 (P, 5) state frames
    questions/<id>.questions + stats   via QuestionLabelGen.gen_data
    WORLD/{mcep20,lf0,vuv,bap,cmp_mcep20}  via WorldFeatLabelGen.gen_data
    wcad-0.030_0.060_0.090_0.120_0.150/    via data.wcad.gen_data
    params/<id>.npz                    true generating parameters

Run:  python tools/create_fixtures.py [--out tests/fixtures]
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")  # deterministic regen

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FRAME_SHIFT_MS = 5.0
FPS = 200  # frames per second
HTK_PER_FRAME = 50000  # 100 ns units per 5 ms frame
SEED = 20260816
THETAS = (0.030, 0.060, 0.090, 0.120, 0.150)

# Phone inventory: name -> (class, (F1, F2, F3) Hz, voiced)
PHONES = {
    "sil": ("silence", (0, 0, 0), False),
    "pau": ("silence", (0, 0, 0), False),
    "a": ("vowel", (800, 1200, 2500), True),
    "e": ("vowel", (500, 1900, 2600), True),
    "i": ("vowel", (300, 2300, 3000), True),
    "o": ("vowel", (500, 900, 2400), True),
    "u": ("vowel", (320, 800, 2200), True),
    "@": ("vowel", (550, 1400, 2500), True),
    "m": ("nasal", (280, 1100, 2200), True),
    "n": ("nasal", (300, 1500, 2500), True),
    "l": ("liquid", (380, 1200, 2600), True),
    "r": ("liquid", (420, 1300, 1700), True),
    "w": ("liquid", (330, 700, 2200), True),
    "b": ("plosive", (350, 1100, 2300), True),
    "d": ("plosive", (350, 1700, 2600), True),
    "g": ("plosive", (350, 1600, 2100), True),
    "p": ("plosive", (400, 1100, 2300), False),
    "t": ("plosive", (400, 1800, 2600), False),
    "k": ("plosive", (400, 1600, 2200), False),
    "s": ("fricative", (0, 5200, 6500), False),
    "sh": ("fricative", (0, 3200, 4500), False),
    "f": ("fricative", (0, 4000, 6000), False),
    "z": ("fricative", (250, 4800, 6000), True),
    "v": ("fricative", (250, 3500, 5000), True),
}
VOWELS = [p for p, (c, _, _) in PHONES.items() if c == "vowel"]
CONSONANTS = [p for p, (c, _, _) in PHONES.items()
              if c not in ("vowel", "silence")]

IDS_16K = ["gen-%04d" % i for i in range(1, 7)]
IDS_48K = ["gen48-%04d" % i for i in range(1, 3)]


# ---------------------------------------------------------------------------
# utterance plan
# ---------------------------------------------------------------------------

def plan_utterance(rng, num_syllables):
    """Random CV(C) syllable chain with silences -> list of
    (phone, duration_frames 5-state split)."""
    phones = ["sil"]
    for _ in range(num_syllables):
        if rng.random() < 0.25:
            phones.append("pau")
        phones.append(CONSONANTS[rng.integers(len(CONSONANTS))])
        phones.append(VOWELS[rng.integers(len(VOWELS))])
        if rng.random() < 0.35:
            phones.append(CONSONANTS[rng.integers(len(CONSONANTS))])
    phones.append("sil")

    plan = []
    for ph in phones:
        cls = PHONES[ph][0]
        if cls == "silence":
            frames = rng.integers(25, 60)
        elif cls == "vowel":
            frames = rng.integers(18, 42)
        else:
            frames = rng.integers(10, 24)
        # split into 5 state durations, middle state longest
        weights = np.array([1.0, 1.5, 2.5, 1.5, 1.0])
        weights = weights * rng.uniform(0.7, 1.3, 5)
        states = np.maximum(
            1, np.round(frames * weights / weights.sum())).astype(int)
        plan.append((ph, states))
    return plan


# ---------------------------------------------------------------------------
# acoustics from the plan
# ---------------------------------------------------------------------------

def _smooth(x, win):
    if win <= 1:
        return x
    kernel = np.hanning(win)
    kernel /= kernel.sum()
    return np.convolve(x, kernel, mode="same")

def make_tracks(rng, plan, fs, formant_scale=1.0, f0_scale=1.0):
    """Plan -> (amp_sp (T,bins), lf0, vuv, bap, f0_true).

    ``formant_scale``/``f0_scale`` shift the synthetic voice (vocal
    tract length and pitch) — e.g. 1.18/1.4 approximates a shorter
    vocal tract, which is what the VTLN warp models.  Used to generate
    multi-speaker corpora for speaker-adaptation tests."""
    from idiaptts_tpu.ops import mcep as mcep_ops

    n_fft = mcep_ops.fs_to_frame_length(fs)
    bins = n_fft // 2 + 1
    freqs = np.linspace(0, fs / 2.0, bins)

    state_frames = np.concatenate([s for _, s in plan])
    total = int(state_frames.sum())
    phone_frames = np.array([int(s.sum()) for _, s in plan])
    ends = np.cumsum(phone_frames)
    starts = ends - phone_frames

    # --- F0 contour: declination + accents on vowels --------------------
    t = np.arange(total) / FPS
    f0 = (215.0 - 55.0 * t / max(t[-1], 1e-6)) * f0_scale
    for (ph, _), s, e in zip(plan, starts, ends):
        if PHONES[ph][0] == "vowel" and rng.random() < 0.6:
            centre, width = (s + e) / 2.0, max(e - s, 4)
            f0 += 25.0 * rng.uniform(0.3, 1.0) * np.exp(
                -0.5 * ((np.arange(total) - centre) / (width / 2.0)) ** 2)
    f0 += rng.normal(0, 1.5, total)
    f0 = _smooth(f0, 9)

    voiced = np.zeros(total, bool)
    energy = np.full(total, -6.0)
    formant_targets = np.zeros((total, 3))
    bw_targets = np.zeros((total, 3))
    for (ph, _), s, e in zip(plan, starts, ends):
        cls, formants, is_voiced = PHONES[ph]
        voiced[s:e] = is_voiced
        formant_targets[s:e] = np.asarray(formants) * formant_scale
        bw_targets[s:e] = (90, 120, 160) if cls == "vowel" \
            else (150, 220, 280)
        if cls == "silence":
            energy[s:e] = -7.5
        elif cls == "vowel":
            energy[s:e] = 0.0
        elif cls in ("nasal", "liquid"):
            energy[s:e] = -1.2
        elif cls == "fricative":
            energy[s:e] = -2.2
        else:  # plosive
            energy[s:e] = -2.8

    # coarticulation: smooth formants/energy across boundaries
    for d in range(3):
        formant_targets[:, d] = _smooth(formant_targets[:, d], 13)
        bw_targets[:, d] = _smooth(bw_targets[:, d], 13)
    energy = _smooth(energy, 9)
    voiced_f = _smooth(voiced.astype(float), 5) > 0.5

    # --- spectral envelope: log-amp formant bumps + tilt -----------------
    tilt = -freqs[None, :] / 4500.0
    log_amp = energy[:, None] + tilt - 2.0
    for d, gain in enumerate((4.0, 3.2, 2.2)):
        centre = formant_targets[:, d:d + 1]
        bw = np.maximum(bw_targets[:, d:d + 1], 50.0)
        bump = gain * np.exp(-0.5 * ((freqs[None, :] - centre) / bw) ** 2)
        bump = np.where(centre > 100.0, bump, 0.0)
        log_amp += bump
    # Voice bar: voiced speech carries strong energy at the fundamental
    # (without it the fricative-adjacent frames octave-double on
    # re-analysis, which real speech does not).
    voiced_col = _smooth(voiced.astype(float), 5)[:, None]
    voice_bar = 3.0 * voiced_col * np.exp(
        -0.5 * ((freqs[None, :] - 190.0) / 130.0) ** 2)
    log_amp += voice_bar
    amp_sp = np.exp(log_amp).astype(np.float32)

    f0_true = np.where(voiced_f, np.maximum(f0, 60.0), 0.0)
    ip = np.where(voiced_f, np.maximum(f0, 60.0), np.nan)
    # linear interp through unvoiced for the lf0 track
    idx = np.arange(total)
    good = ~np.isnan(ip)
    if good.any():
        ip = np.interp(idx, idx[good], ip[good])
    else:
        ip = np.full(total, 160.0)
    lf0 = np.log(ip).astype(np.float32)
    vuv = voiced_f.astype(np.float32)
    bap = np.where(voiced_f[:, None], np.log(0.03),
                   np.log(0.98)).astype(np.float32)
    return amp_sp, lf0, vuv, bap, f0_true.astype(np.float32)


def synth_wav(amp_sp, lf0, vuv, bap, fs):
    from idiaptts_tpu.data.world_feat import WorldFeatLabelGen
    raw = WorldFeatLabelGen.world_features_to_raw(
        amp_sp, lf0, vuv, bap, fs, FRAME_SHIFT_MS)
    peak = np.abs(raw).max() + 1e-9
    return (0.5 * raw / peak).astype(np.float32)


# ---------------------------------------------------------------------------
# labels
# ---------------------------------------------------------------------------

def full_context(plan, idx):
    """HTS-shaped full-context label string for phone ``idx``."""
    def at(j):
        return plan[j][0] if 0 <= j < len(plan) else "xx"
    ll, l, c, r, rr = (at(idx - 2), at(idx - 1), at(idx),
                       at(idx + 1), at(idx + 2))
    num = len(plan)
    pfw, pbw = idx + 1, num - idx
    cls = PHONES[c][0]
    vc = "v" if cls == "vowel" else "c"
    return ("{ll}~{l}-{c}+{r}={rr}:{pfw}_{pbw}"
            "/A/{vc}_{cls}"
            "/B/{syl}-{wlen}"
            "/J/{num}+{nv}-1").format(
        ll=ll, l=l, c=c, r=r, rr=rr, pfw=pfw, pbw=pbw, vc=vc, cls=cls,
        syl=1 + idx % 3, wlen=2 + idx % 4, num=num,
        nv=sum(1 for p, _ in plan if PHONES[p][0] == "vowel"))


def write_labels(plan, uid, out):
    os.makedirs(os.path.join(out, "labels", "label_state_align"),
                exist_ok=True)
    os.makedirs(os.path.join(out, "labels", "full"), exist_ok=True)
    os.makedirs(os.path.join(out, "labels", "mono_no_align"),
                exist_ok=True)
    os.makedirs(os.path.join(out, "labels", "mfa"), exist_ok=True)

    state_lines, full_lines, mono_lines = [], [], []
    tg_phones = []
    t = 0
    for i, (ph, states) in enumerate(plan):
        label = full_context(plan, i)
        phone_start = t
        for s, dur in enumerate(states):
            start, end = t, t + int(dur) * HTK_PER_FRAME
            state_lines.append("%d %d %s[%d]" % (start, end, label, s + 2))
            t = end
        full_lines.append("%d %d %s" % (phone_start, t, label))
        mono_lines.append(ph)
        tg_phones.append((phone_start / 1e7, t / 1e7, ph))

    with open(os.path.join(out, "labels", "label_state_align",
                           uid + ".lab"), "w") as f:
        f.write("\n".join(state_lines) + "\n")
    with open(os.path.join(out, "labels", "full", uid + ".lab"),
              "w") as f:
        f.write("\n".join(full_lines) + "\n")
    with open(os.path.join(out, "labels", "mono_no_align",
                           uid + ".lab"), "w") as f:
        f.write("\n".join(mono_lines) + "\n")
    write_textgrid(os.path.join(out, "labels", "mfa",
                                uid + ".TextGrid"), tg_phones)


def write_textgrid(path, phones):
    xmax = phones[-1][1]
    # Words tier: contiguous non-silence runs become pseudo-words.
    words, cur = [], None
    for lo, hi, mark in phones:
        silent = mark in ("sil", "pau")
        if silent:
            if cur is not None:
                words.append(cur)
                cur = None
            words.append((lo, hi, ""))
        elif cur is None:
            cur = [lo, hi, "w%d" % (len(words) + 1)]
        else:
            cur[1] = hi
    if cur is not None:
        words.append(cur)

    def tier(name, entries, silent_empty):
        out = ["        class = \"IntervalTier\"",
               '        name = "%s"' % name,
               "        xmin = 0", "        xmax = %g" % xmax,
               "        intervals: size = %d" % len(entries)]
        for k, (lo, hi, mark) in enumerate(entries):
            if silent_empty and mark in ("sil", "pau"):
                mark = ""
            out += ["        intervals [%d]:" % (k + 1),
                    "            xmin = %g" % lo,
                    "            xmax = %g" % hi,
                    '            text = "%s"' % mark]
        return out

    lines = ['File type = "ooTextFile"', 'Object class = "TextGrid"', "",
             "xmin = 0", "xmax = %g" % xmax, "tiers? <exists>",
             "size = 2", "item []:", "    item [1]:"]
    lines += tier("words", words, False)
    lines += ["    item [2]:"]
    lines += tier("phones", phones, True)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def write_question_file(path):
    """Generated QS/CQS question set over the phone inventory (the
    repo-local stand-in for the reference's Festival-derived .hed
    config files).  Shares the generator with
    tools/make_question_file.py so user-generated and fixture question
    files have identical structure."""
    from make_question_file import build_questions
    class_map = {ph: (cls, voiced)
                 for ph, (cls, _, voiced) in PHONES.items()}
    lines = build_questions(sorted(PHONES), class_map)
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return len(lines)


# ---------------------------------------------------------------------------
# main
# ---------------------------------------------------------------------------

def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default=os.path.join(
        REPO, "tests", "fixtures"))
    args = parser.parse_args()
    out = args.out

    from idiaptts_tpu.data.questions import QuestionLabelGen
    from idiaptts_tpu.data.world_feat import WorldFeatLabelGen
    from idiaptts_tpu.data import wcad
    from idiaptts_tpu.ops.audio_io import raw_to_file, resample

    rng = np.random.default_rng(SEED)
    os.makedirs(os.path.join(out, "database", "wav"), exist_ok=True)
    os.makedirs(os.path.join(out, "database", "wav48"), exist_ok=True)
    os.makedirs(os.path.join(out, "dur"), exist_ok=True)
    os.makedirs(os.path.join(out, "params"), exist_ok=True)

    num_q = write_question_file(
        os.path.join(out, "questions-gen_dnn.hed"))
    print("question file: %d questions" % num_q)

    for uid in IDS_16K + IDS_48K:
        fs = 48000 if uid.startswith("gen48") else 16000
        plan = plan_utterance(rng, int(rng.integers(3, 6)))
        amp_sp, lf0, vuv, bap, f0_true = make_tracks(rng, plan, fs)
        raw = synth_wav(amp_sp, lf0, vuv, bap, fs)
        sub = "wav48" if fs == 48000 else "wav"
        raw_to_file(os.path.join(out, "database", sub, uid + ".wav"),
                    raw, fs)
        write_labels(plan, uid, out)
        durations = np.stack([s for _, s in plan]).astype(np.float32)
        durations.tofile(os.path.join(out, "dur", uid + ".dur"))
        np.savez(os.path.join(out, "params", uid + ".npz"),
                 lf0=lf0, vuv=vuv, f0=f0_true, bap=bap,
                 frame_shift_ms=FRAME_SHIFT_MS, fs=fs)
        print("%s: %d phones, %d frames, %.2fs" % (
            uid, len(plan), len(lf0), len(raw) / fs))

    with open(os.path.join(out, "file_id_list.txt"), "w") as f:
        f.write("\n".join(IDS_16K) + "\n")
    with open(os.path.join(out, "labels", "mono_phone.list"), "w") as f:
        f.write("\n".join(sorted(PHONES)) + "\n")

    # ---- derived features via the framework's own extractors ----------
    print("extracting WORLD features ...")
    gen = WorldFeatLabelGen(WorldFeatLabelGen.Config(
        name="cmp_features", directory=os.path.join(out, "WORLD"),
        num_coded_sps=20, add_deltas=True, sp_type="mcep"))
    # No file_id_list prefix: readers look the stats up under the
    # unprefixed names (reference fixture layout).
    gen.gen_data(os.path.join(out, "database", "wav"),
                 dir_out=os.path.join(out, "WORLD"),
                 id_list=IDS_16K)

    print("extracting question labels ...")
    QuestionLabelGen.gen_data(
        os.path.join(out, "labels", "label_state_align"),
        os.path.join(out, "questions-gen_dnn.hed"),
        dir_out=os.path.join(out, "questions"),
        id_list=IDS_16K)

    print("extracting wcad atoms ...")
    theta_dir = "wcad-" + "_".join("%.3f" % t for t in THETAS)
    # Low min_amp so every utterance (including short, weakly accented
    # ones) gets a non-empty atom decomposition.
    wcad.gen_data(os.path.join(out, "WORLD"), list(THETAS),
                  os.path.join(out, theta_dir), IDS_16K,
                  min_amp=0.08, file_id_list_name="file_id_list")
    print("fixtures written to", out)


if __name__ == "__main__":
    main()
