// Empty stand-in: dada.h includes RcppParallel.h but the aligner
// translation units never use its symbols.
#pragma once
