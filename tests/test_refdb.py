"""Reference-DB builders (synthetic inputs) + tax.check harness."""
import gzip

import numpy as np
import pytest

from dada2_tpu.refdb import (make_species_fasta_rdp,
                             make_taxonomy_fasta_gg2,
                             make_taxonomy_fasta_rdp, tax_check)
from dada2_tpu.taxonomy import read_fasta


def test_make_taxonomy_fasta_rdp(tmp_path):
    fin = tmp_path / "rdp.fa"
    fin.write_text(
        ">S001\tBacillus subtilis strain X\tBacteria;Firmicutes;Bacilli;"
        "Bacillales;Bacillaceae;Bacillus\n" + "ACGT" * 30 + "\n"
        ">S002\tEscherichia coli K12\tBacteria;Proteobacteria;"
        "Gammaproteobacteria;Enterobacterales;Enterobacteriaceae;"
        "Escherichia\n" + "TTGA" * 30 + "\n")
    fdb = tmp_path / "db.txt"
    fdb.write_text("\n".join(
        f"{k}*{name}*0*0*{lev}" for k, (name, lev) in enumerate([
            ("Bacteria", "domain"), ("Firmicutes", "phylum"),
            ("Bacilli", "class"), ("Bacillales", "order"),
            ("Bacillaceae", "family"), ("Bacillus", "genus"),
            ("Proteobacteria", "phylum"),
            ("Gammaproteobacteria", "class"),
            ("Enterobacterales", "order"),
            ("Enterobacteriaceae", "family"), ("Escherichia", "genus"),
        ])) + "\n")
    fout = tmp_path / "train.fa.gz"
    make_taxonomy_fasta_rdp(str(fin), str(fdb), str(fout),
                            include_species=True)
    ids, seqs = read_fasta(str(fout))
    assert len(ids) == 2
    assert ids[0] == ("Bacteria;Firmicutes;Bacilli;Bacillales;"
                      "Bacillaceae;Bacillus;subtilis;")
    assert ids[1].startswith("Bacteria;Proteobacteria;")
    assert ids[1].endswith("Escherichia;coli;")


def test_make_taxonomy_fasta_gg2(tmp_path):
    fn = tmp_path / "sq.fa"
    fn.write_text(">id1\n" + "ACGT" * 30 + "\n>id2\n" + "GGCA" * 30 + "\n")
    txfn = tmp_path / "tax.tsv"
    txfn.write_text(
        "Feature ID\tTaxon\n"
        "id1\td__Bacteria; p__Firmicutes; c__Bacilli; o__Lactobacillales; "
        "f__Lactobacillaceae; g__Lactobacillus; s__Lactobacillus iners\n"
        "id2\td__Bacteria; p__Proteobacteria; c__; o__; f__; g__; s__\n")
    fout = tmp_path / "gg2.fa.gz"
    make_taxonomy_fasta_gg2(str(fn), str(txfn), str(fout),
                            include_species=True)
    ids, seqs = read_fasta(str(fout))
    assert ids[0].endswith("g__Lactobacillus;s__iners;")
    assert ids[1] == "d__Bacteria;p__Proteobacteria;"


def test_tax_check(extdata):
    out = tax_check(str(extdata / "example_train_set.fa.gz"),
                    str(extdata / "ten_16s.100.fa.gz"), nseq=20)
    assert out.shape == (20, 2)
    # reference labels parsed from the ;tax= annotations
    assert out["reference"].notna().all()
    # the bundled example train set is tiny, so most test genera are
    # absent; the harness still finds exact matches where they exist
    both = out.dropna()
    assert (both["assigned"] == both["reference"]).any()
