"""Algorithm kernels: correction/ESS, tempering schedule, resampling,
initialization, and the blocked RWMH mutation (reference L2, SURVEY.md §1)."""
