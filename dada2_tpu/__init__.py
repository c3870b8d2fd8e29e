"""dada2-tpu: TPU-native amplicon sample inference.

A from-scratch JAX/XLA/Pallas reimplementation of the DADA2 method
(Callahan et al. 2016; reference implementation: the dada2 R package).
Exact ASV inference: filter/trim -> dereplicate -> learn error rates ->
divisive partitioning -> merge pairs -> sequence table -> chimera removal ->
taxonomy.
"""
from .options import DadaOptions, DEFAULT_OPTIONS, get_dada_opt
from .derep import Derep, derep_fastq, combine_dereps
from .dada import DadaResult, dada, dada_uniques
from .errors import (loess_errfun, noqual_errfun, pacbio_errfun,
                     make_binned_qual_errfun, inflate_err, get_errors,
                     accumulate_trans)
from .paired import (merge_pairs, nwalign, nwhamming, eval_pair,
                     pair_consensus)
from .seqtab import (make_sequence_table, collapse_no_mismatch,
                     merge_sequence_tables, get_uniques, uniques_to_fasta,
                     seqtab_to_qiime)
from .encode import rc, is_acgt

__version__ = "0.1.0"

# learn_errors, filter_and_trim, chimera and taxonomy entry points are
# imported lazily below to keep import light; they are re-exported once
# their modules land.


def learn_errors(*args, **kwargs):
    from .learn import learn_errors as _le
    return _le(*args, **kwargs)


def filter_and_trim(*args, **kwargs):
    from .filter import filter_and_trim as _ft
    return _ft(*args, **kwargs)


def remove_bimera_denovo(*args, **kwargs):
    from .chimeras import remove_bimera_denovo as _rb
    return _rb(*args, **kwargs)


def assign_taxonomy(*args, **kwargs):
    from .taxonomy import assign_taxonomy as _at
    return _at(*args, **kwargs)
