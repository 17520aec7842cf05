"""Text analysis for large-scale training-data pipelines — all native
``pyspark.sql.functions`` column expressions (JVM-side, codegen; zero
Python in the plan), designed over a ``documents(doc_id, text, lang,
source, n_chars)`` table.

Reference analogues: language filter (``corpus/.../LanguageScorer.java:41-76``,
keep P(lang) >= 0.8), sentence/char bounds (``CreateTsvDataset.java:167-170``),
word counting (``GatherRelexVocab.java:131-138``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword langid heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "it", "that"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est"],
    "es": ["el", "la", "los", "y", "de", "un", "una", "es"],
    "de": ["der", "die", "das", "und", "von", "ein", "eine", "ist"],
}


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank)."""
    t = F.trim(text)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+"))).cast("bigint")


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish regex token count: words, numbers, and single punctuation
    marks counted separately (approximates subword tokenizer pre-split)."""
    toks = F.regexp_extract_all(text, F.lit(r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"), 1)
    return F.size(toks).cast("bigint")


def punct_ratio(text: Column) -> Column:
    """Fraction of non-space chars that are punctuation. Unicode letter/
    digit classes (\\p{L}\\p{N}) — an ASCII class would score every
    accented/non-Latin LETTER as punctuation, tanking quality_score on
    exactly the multilingual corpora the langid path targets (same
    classes in Java regex and the DuckDB RE2 oracle, value-verified)."""
    nonspace = F.length(F.regexp_replace(text, r"\s+", ""))
    punct = F.length(F.regexp_replace(text, r"[\p{L}\p{N}\s]+", ""))
    return F.when(nonspace > 0, punct.cast("double") / nonspace).otherwise(F.lit(0.0))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Fraction of whitespace tokens that are stopwords of `lang`."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    n = F.size(toks)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite quality score in [0,1]: length band + low punctuation +
    healthy mean word length. Same shape as the reference's bounds
    filters (chars in [2,400] per sentence, CreateTsvDataset.java:167-170)."""
    n = F.length(text)
    len_ok = F.when((n >= 50) & (n <= 10000), 1.0).when(n > 0, 0.5).otherwise(0.0)
    toks = token_count(text)
    mean_wl = F.when(toks > 0, n.cast("double") / toks).otherwise(F.lit(0.0))
    wl_ok = F.when((mean_wl >= 3.0) & (mean_wl <= 12.0), 1.0).otherwise(0.0)
    p_ok = F.when(punct_ratio(text) <= 0.2, 1.0).otherwise(0.0)
    return ((len_ok + wl_ok + p_ok) / 3.0).alias("quality")


def lang_id(text: Column) -> Column:
    """Stopword-vote language ID over {en,fr,es,de}, 'und' when no vote.
    Deterministic tie-break: language name ascending."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    scores = []
    for lang in sorted(STOPWORDS):
        sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        scores.append(
            F.struct(
                F.size(F.filter(toks, lambda t: F.array_contains(sw, t))).alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(
        F.array(
            *[
                F.struct(s["hits"].alias("hits"), F.lit(-i).alias("ord"), s["lang"].alias("lang"))
                for i, s in enumerate(scores)
            ]
        )
    )
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


# ---------------------------------------------------------------- M5
# Trigram naive-Bayes language posterior — the shipped language FILTER
# (the reference thresholds a real detector's P(lang) >= 0.8,
# LanguageScorer.java:41-76). The native stopword vote above remains the
# SQL-oracle-able query; this model is the fidelity path: hashed
# character-trigram log-probability profiles built at import time from
# embedded seed text (original sentences written for this module), with
# per-batch numpy scoring inside a pandas UDF (no per-row Python string
# loops: each text becomes one byte array and its trigram bucket ids are
# three shifted views combined arithmetically).

_SEED_TEXT = {
    "en": (
        "the quick brown fox jumps over the lazy dog while the children "
        "watch from the garden and their mother brings them bread with "
        "butter and honey because it is a warm afternoon and everyone "
        "would rather stay outside than finish the work that is waiting "
        "inside the house which has been there for many years "
        "good morning everyone said the teacher when she opened the door "
        "of the small school and asked the students to take their books "
        "from the shelves near the window so that they could read about "
        "rivers mountains and cities before lunch was served in the hall"
    ),
    "fr": (
        "le renard brun saute par dessus le chien paresseux pendant que "
        "les enfants regardent depuis le jardin et que leur mère leur "
        "apporte du pain avec du beurre et du miel parce que c'est un "
        "après-midi chaud et que tout le monde préfère rester dehors "
        "plutôt que de finir le travail qui attend dans la maison "
        "bonjour tout le monde dit la maîtresse en ouvrant la porte de "
        "la petite école et elle demande aux élèves de prendre leurs "
        "livres sur les étagères près de la fenêtre pour lire des "
        "histoires de rivières de montagnes et de villes avant le repas"
    ),
    "es": (
        "el zorro marrón salta sobre el perro perezoso mientras los "
        "niños miran desde el jardín y su madre les trae pan con "
        "mantequilla y miel porque es una tarde cálida y todos "
        "prefieren quedarse afuera en lugar de terminar el trabajo que "
        "espera dentro de la casa que lleva allí muchos años "
        "buenos días a todos dice la maestra cuando abre la puerta de la "
        "pequeña escuela y pide a los estudiantes que tomen sus libros "
        "de los estantes junto a la ventana para leer historias sobre "
        "ríos montañas y ciudades antes de que sirvan la comida señora"
    ),
    "de": (
        "der braune fuchs springt über den faulen hund während die "
        "kinder aus dem garten zuschauen und ihre mutter ihnen brot mit "
        "butter und honig bringt weil es ein warmer nachmittag ist und "
        "alle lieber draußen bleiben als die arbeit zu beenden die im "
        "haus wartet das seit vielen jahren dort steht "
        "guten morgen alle zusammen sagt die lehrerin als sie die tür "
        "der kleinen schule öffnet und die schüler bittet ihre bücher "
        "von den regalen am fenster zu nehmen um vor dem mittagessen "
        "geschichten über flüsse berge und städte zu lesen"
    ),
    "it": (
        "la volpe marrone salta sopra il cane pigro mentre i bambini "
        "guardano dal giardino e la loro madre porta loro pane con "
        "burro e miele perché è un pomeriggio caldo e tutti "
        "preferiscono stare fuori piuttosto che finire il lavoro che "
        "aspetta dentro la casa che è lì da molti anni "
        "buongiorno a tutti dice la maestra quando apre la porta della "
        "piccola scuola e chiede agli studenti di prendere i loro libri "
        "dagli scaffali vicino alla finestra per leggere storie di "
        "fiumi montagne e città prima che il pranzo sia servito"
    ),
    "pt": (
        "a raposa marrom pula sobre o cão preguiçoso enquanto as "
        "crianças observam do jardim e a mãe delas traz pão com "
        "manteiga e mel porque é uma tarde quente e todos preferem "
        "ficar do lado de fora em vez de terminar o trabalho que "
        "espera dentro da casa que está lá há muitos anos "
        "bom dia a todos diz a professora quando abre a porta da "
        "pequena escola e pede aos alunos que peguem seus livros nas "
        "prateleiras perto da janela para ler histórias sobre rios "
        "montanhas e cidades antes que o almoço seja servido"
    ),
}

_LANGS = sorted(_SEED_TEXT)
_N_BUCKETS = 4096


def _trigram_buckets(data: bytes):
    """Bucket ids of every byte trigram — pure numpy, no Python loop."""
    import numpy as np

    b = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    if len(b) < 3:
        return np.zeros(0, dtype=np.int64)
    return ((b[:-2] * 31 + b[1:-1]) * 31 + b[2:]) % _N_BUCKETS


def _build_profiles():
    import numpy as np

    counts = np.ones((_N_BUCKETS, len(_LANGS)))  # Laplace smoothing
    for j, lang in enumerate(_LANGS):
        bk = _trigram_buckets((" " + _SEED_TEXT[lang] + " ").encode("utf-8"))
        np.add.at(counts, bk, np.eye(len(_LANGS))[j])
    return np.log(counts / counts.sum(axis=0, keepdims=True))


_PROFILES = None


def _profiles():
    global _PROFILES
    if _PROFILES is None:
        _PROFILES = _build_profiles()
    return _PROFILES


def score_language(texts) -> "tuple":
    """(best_lang, posterior) per text — the numpy kernel (shared by the
    pandas UDF and tests). Posterior is the softmax over per-language
    mean trigram log-probabilities; empty/too-short texts -> ('und', 0)."""
    import numpy as np

    logp = _profiles()
    langs = np.array(_LANGS)
    out_lang, out_post = [], []
    for t in texts:
        norm = " ".join((t or "").lower().split())
        bk = _trigram_buckets(norm.encode("utf-8"))
        if len(bk) < 4:
            out_lang.append("und")
            out_post.append(0.0)
            continue
        scores = logp[bk].mean(axis=0)
        e = np.exp((scores - scores.max()) * 20.0)  # sharpen: mean-logp gaps are small
        p = e / e.sum()
        j = int(np.argmax(p))
        out_lang.append(str(langs[j]))
        out_post.append(float(p[j]))
    return out_lang, out_post


def lang_posterior_udf():
    """pandas UDF: text -> struct(lang, posterior). Use
    ``filter(col('lp.posterior') >= 0.8)`` for the reference's P7
    threshold semantics."""
    @F.pandas_udf("lang string, posterior double")
    def fn(texts: pd.Series) -> pd.DataFrame:
        lang, post = score_language(texts)
        return pd.DataFrame({"lang": lang, "posterior": post})

    return fn


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the
    whitespace-normalized lowercase text (md5 exists in both Spark and
    DuckDB, so the oracle can reproduce it)."""
    norm = F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))
    return F.md5(norm)


VOCAB_LADDER = [2, 3, 5, 8, 12, 18, 27, 41, 62, 93]


def vocab_tokens(docs, text_col: str = "text"):
    """RelexVocab.add counting source (``RelexVocab.java:56-69``): one
    row per normalized token, PLUS for each Integer.parseInt-accepted
    token its '#'-digit-sequence twin of the SAME string length
    (toDigitSequence pads to d.length(), so a sign or leading zeros
    count toward the length) — '####' earns vocab mass from every
    4-char integer, which is what lets the tensor encoder's OOV-integer
    fallback resolve.

    Single corpus pass: the twin rides a conditional array explode off
    the one tokenizing scan (a union of two branches would read, trim,
    lower, split and explode the full corpus twice — this is the
    hottest full-corpus path). The ONE shared counting source for the
    driver vocab queries and the DatasetBuilder vocab stage.
    """
    from pyspark.sql import functions as F

    from cc_dbp_spark.functions.parity import is_parseint_col

    w = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("w0")
    ).filter(F.col("w0") != "")
    return w.select(
        F.explode(
            F.when(
                is_parseint_col(F.col("w0")),
                F.array(F.col("w0"), F.expr("repeat('#', length(w0))")),
            ).otherwise(F.array(F.col("w0")))
        ).alias("word")
    )


def choose_vocab_min_count(word_counts, vocab_limit: int) -> tuple[int, object]:
    """A6 vocab auto-tune (``GatherRelexVocab.java:141-191``): bucket the
    count distribution at the reference's threshold ladder, then pick the
    smallest threshold whose surviving vocabulary fits `vocab_limit`.

    word_counts: DataFrame(word, cnt). Returns (min_count, filtered DF).
    The histogram is one aggregation; the cutoff scan is driver-side over
    ~10 buckets (exactly the reference's split of work).
    """
    from pyspark.sql import functions as F

    bucket = F.lit(0)
    for t in VOCAB_LADDER:
        bucket = F.when(F.col("cnt") >= t, F.lit(t)).otherwise(bucket)
    hist = dict(
        word_counts.select(bucket.alias("b"))
        .groupBy("b")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    # words surviving threshold t = sum of buckets >= t (t=1 keeps all:
    # bucket 0 holds the cnt==1 words below the ladder)
    min_count = VOCAB_LADDER[-1]
    for t in [1] + VOCAB_LADDER:
        surviving = sum(n for b, n in hist.items() if t == 1 or b >= t)
        if surviving <= vocab_limit:
            min_count = t
            break
    return min_count, word_counts.filter(F.col("cnt") >= min_count)


def rolling_hash_fingerprint(text: Column, window: int = 8) -> Column:
    """Min-of-rolling-hashes fingerprint: min over xxhash64 of each
    `window`-token shingle (content-defined; robust to reordering at the
    edges). Returns bigint; null for texts shorter than the window."""
    toks = F.split(F.lower(F.trim(F.regexp_replace(text, r"\s+", " "))), " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), n - window)
    shingles = F.transform(
        idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, window)))
    )
    return F.when(n >= window, F.array_min(shingles)).otherwise(F.lit(None).cast("bigint"))
