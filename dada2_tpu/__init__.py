"""dada2-tpu: TPU-native amplicon sample inference.

A from-scratch JAX/XLA/Pallas reimplementation of the DADA2 method
(Callahan et al. 2016; reference implementation: the dada2 R package).
Exact ASV inference: filter/trim -> dereplicate -> learn error rates ->
divisive partitioning -> merge pairs -> sequence table -> chimera removal ->
taxonomy.
"""
# Allocator policy first: large numpy temporaries must reuse heap pages
# (page faults are ~100x compute cost on lazily-backed VM memory; see
# utils/hostmem.py for the measurements and rationale).
from .utils.hostmem import tune_malloc as _tune_malloc

_tune_malloc()

from .options import (DadaOptions, DEFAULT_OPTIONS, get_dada_opt,
                      set_dada_opt)
from .derep import Derep, derep_fastq, derep_fasta, combine_dereps
from .dada import DadaResult, dada, dada_uniques
from .errors import (loess_errfun, noqual_errfun, pacbio_errfun,
                     make_binned_qual_errfun, inflate_err, get_errors,
                     accumulate_trans)
from .paired import (merge_pairs, nwalign, nwhamming, nweval,
                     nwextract, eval_pair, pair_consensus)
from .seqtab import (make_sequence_table, collapse_no_mismatch,
                     merge_sequence_tables, get_uniques, get_sequences,
                     uniques_to_fasta, seqtab_to_qiime)
from .encode import rc, is_acgt
from .learn import learn_errors
from .filter import (filter_and_trim, fastq_filter, fastq_paired_filter,
                     is_phix, seq_complexity, remove_primers)
from .chimeras import (is_bimera, is_bimera_denovo, is_bimera_denovo_table,
                       remove_bimera_denovo, is_shift_denovo)
from .taxonomy import (assign_taxonomy, assign_species, add_species)
from .plot import plot_errors, plot_quality_profile, plot_complexity

__version__ = "0.1.0"
from .diagnostics import (kmer_dist, kord_dist, kmer_matches,
                          kdist_matches, check_convergence, pfasta,
                          seqtab_to_mothur, samdf_to_qiime2)
from . import data, refdb, trace
from .refdb import tax_check
from .trace import COUNTERS, profile_trace
