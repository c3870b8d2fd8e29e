"""Taxonomy assignment against the bundled training set."""
import numpy as np
import pytest

from dada2_tpu.taxonomy import (add_species, assign_species,
                                assign_taxonomy, match_genera, read_fasta,
                                tax_karray)


def test_tax_karray():
    a = tax_karray("ACGTACGTAC")  # 3 8-mers
    assert len(a) == 3
    # N at position 4 invalidates the 5 windows that cover it
    assert tax_karray("ACGTNCGTACGTAC").size == 2
    assert tax_karray("ACGT").size == 0


def test_assign_taxonomy_example(extdata):
    seqs = None
    tax = assign_taxonomy(str(extdata / "example_seqs.fa"),
                          str(extdata / "example_train_set.fa.gz"))
    assert tax.shape[1] == 6
    # every classified row is a Bacteria at the kingdom level
    kingdoms = set(tax["Kingdom"].dropna())
    assert kingdoms <= {"Bacteria"}
    assert tax["Kingdom"].notna().mean() >= 0.8
    # known genera from the reference docs example
    assert "Lactobacillus" in set(tax["Genus"].dropna())


def test_assign_taxonomy_boots(extdata):
    out = assign_taxonomy(str(extdata / "example_seqs.fa"),
                          str(extdata / "example_train_set.fa.gz"),
                          outputBootstraps=True)
    assert (out["boot"].values <= 100).all()
    assert (out["boot"].values >= 0).all()
    # confidence should decrease (weakly) down the levels
    b = out["boot"].values
    assert (b[:, 0] >= b[:, 5]).all()


def test_assign_species(extdata):
    ids, refs = read_fasta(str(extdata / "example_species_assignment.fa.gz"))
    # a read that IS a fragment of a reference must hit it
    frag = refs[0][100:250]
    out = assign_species([frag], str(extdata /
                                     "example_species_assignment.fa.gz"))
    expect_genus = ids[0].split()[1]
    assert out.iloc[0]["Genus"] == expect_genus or \
        out.iloc[0]["Genus"] == "Escherichia/Shigella"
    # a random sequence must not hit
    rng = np.random.default_rng(1)
    randseq = "".join("ACGT"[i] for i in rng.integers(0, 4, 150))
    out2 = assign_species([randseq], str(
        extdata / "example_species_assignment.fa.gz"))
    assert out2.iloc[0]["Species"] is None


def test_match_genera():
    assert match_genera("Escherichia/Shigella", "Escherichia")
    assert match_genera("Clostridium_sensu_stricto", "Clostridium")
    assert match_genera("Bacillus", "Bacillus")
    assert not match_genera("Lactobacillus", "Bacillus")
    assert not match_genera(None, "Bacillus")


def test_add_species(extdata):
    tax = assign_taxonomy(str(extdata / "example_seqs.fa"),
                          str(extdata / "example_train_set.fa.gz"))
    sp = add_species(tax, str(extdata / "example_species_assignment.fa.gz"))
    assert "Species" in sp.columns
    assert sp.shape[0] == tax.shape[0]


def test_score_batch_chunked_equivalence():
    """Genus-axis chunking of the bootstrap scoring must not change any
    assignment (same PRNG draws, running-max merge)."""
    import jax
    import jax.numpy as jnp
    from dada2_tpu.taxonomy import _score_batch

    rng = np.random.default_rng(9)
    G, Aq = 50, 120
    lgk = jnp.asarray(rng.uniform(-12, -2, (G, 65536)).astype(np.float32))
    karrays = [rng.integers(0, 65536, size=int(rng.integers(40, Aq)))
               for _ in range(12)]
    key = jax.random.PRNGKey(7)
    full = _score_batch(karrays, lgk, key, G, mem_cap=1 << 40)
    chunked = _score_batch(karrays, lgk, key, G, mem_cap=12 * 130 * 20)
    for a, b in zip(full, chunked):
        np.testing.assert_array_equal(a, b)


def test_containment_non_acgt_query_anchor():
    """Queries with non-ACGT bases in the anchor window must still match
    literally (direct-scan fallback)."""
    from dada2_tpu.taxonomy import _containment_hits

    refs = ["AAACGTNCGTACGTACGTACGTCCC", "AAACGTACGTACGTACGTACGTCCC"]
    q = "ACGTNCGTACGTACGTACGT"      # N within the first 16 chars
    hits = _containment_hits([q], refs)
    assert hits[0] == {0}


def test_silva_scale_ingestion(tmp_path):
    """SILVA-scale DB: 10k genera x 100k refs must ingest via the bulk
    vectorized karray/lgk path and classify on one chip without OOM
    (reference: src/taxonomy.cpp:227-270 builds the same
    [ngenus, 65536] float table).

    Sized to the real thing in genus count (SILVA nr99 has ~8-10k
    genera) with shorter refs (600nt vs ~1.4kb) to keep CI time sane —
    ref length only affects the O(total bases) ingestion, which is the
    path under test."""
    import time

    from dada2_tpu.taxonomy import _build_lgk, assign_taxonomy

    rng = np.random.default_rng(5)
    ngenus, refs_per, L = 10_000, 10, 600
    nt = np.array(list("ACGT"), dtype="U1")
    # genus base sequences, refs = mutated copies (vectorized build)
    base = rng.integers(0, 4, (ngenus, L), dtype=np.int8)
    lines = []
    t0 = time.time()
    for g in range(ngenus):
        muts = rng.integers(0, 4, (refs_per, L), dtype=np.int8)
        sel = rng.random((refs_per, L)) < 0.03
        block = np.where(sel, muts, base[g][None, :])
        for r in range(refs_per):
            lines.append(f">Bacteria;P{g % 40};C{g % 200};G{g};")
            lines.append("".join(nt[block[r]]))
    fa = tmp_path / "silva_scale.fa"
    fa.write_text("\n".join(lines) + "\n")
    t_gen = time.time() - t0

    # queries: mutated fragments of known genera
    queries = []
    truth = []
    for g in (7, 4242):
        s = "".join(nt[base[g][:400]])
        queries.append(s)
        truth.append(f"G{g}")

    t0 = time.time()
    res = assign_taxonomy(queries, str(fa), minBoot=50)
    t_all = time.time() - t0
    print(f"[scale] fixture gen {t_gen:.1f}s, "
          f"assign_taxonomy(10k genera, 100k refs) {t_all:.1f}s")
    assert list(res.columns[:1]) == ["Kingdom"] or res.shape[0] == 2
    got = [res.iloc[k].dropna().tolist()[-1] for k in range(2)]
    assert got == truth, (got, truth)
