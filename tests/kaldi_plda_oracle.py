"""Literal transcriptions of Kaldi's PLDA estimator/scorer and LDA
computation, used as test oracles for pkr_tpu.eval.plda (the same treatment
eval/metrics.py's EER/minDCF got).

Sources transcribed (public Kaldi, the binaries the reference invokes at
run.sh:331-350 and test.sh:25-30):
  - src/ivector/plda.cc: PldaStats::AddSamples, PldaEstimator
    (InitParameters / GetStatsFromIntraClass / GetStatsFromClassMeans /
    EstimateFromStats / GetOutput), Plda::TransformIvector /
    GetNormalizationFactor / LogLikelihoodRatio
  - src/ivectorbin/ivector-compute-lda.cc: CovarianceStats::AccStats,
    ComputeNormalizingTransform, ComputeLdaTransform

The transcription is deliberately loop-level and unvectorized so each
statement maps 1:1 onto a Kaldi statement; pkr_tpu.eval.plda is the
vectorized redesign that must agree with this to float tolerance.
"""

import numpy as np

M_LOG_2PI = 1.8378770664093454835606594728112


# ---------------------------------------------------------------------------
# plda.cc: estimation
# ---------------------------------------------------------------------------


class PldaStats:
    """PldaStats with weight 1.0 per class (ivector-compute-plda's usage)."""

    def __init__(self, dim):
        self.dim = dim
        self.offset_scatter = np.zeros((dim, dim))
        self.sum_ = np.zeros(dim)
        self.class_info = []  # (weight, mean, n)
        self.num_classes = 0
        self.num_examples = 0
        self.class_weight = 0.0
        self.example_weight = 0.0

    def add_samples(self, weight, group):
        """PldaStats::AddSamples: group is (n, dim) — one class's rows."""
        group = np.asarray(group, np.float64)
        n = group.shape[0]
        mean = group.sum(axis=0) / n
        # offset_scatter_.AddMat2(weight, group, kTrans, 1.0)
        self.offset_scatter += weight * (group.T @ group)
        # offset_scatter_.AddVec2(-n * weight, *mean)
        self.offset_scatter += (-n * weight) * np.outer(mean, mean)
        self.class_info.append((weight, mean, n))
        self.num_classes += 1
        self.num_examples += n
        self.class_weight += weight
        self.example_weight += weight * n
        self.sum_ += weight * mean

    def sort(self):
        """PldaStats::Sort() — by num_examples (only affects the n-cache)."""
        self.class_info.sort(key=lambda c: c[2])


class PldaEstimator:
    """PldaEstimator with the default PldaEstimationConfig
    (num_em_iters = 10)."""

    def __init__(self, stats):
        self.stats = stats
        dim = stats.dim
        # InitParameters(): both covariances start at identity
        self.within_var = np.eye(dim)
        self.between_var = np.eye(dim)

    def _reset_per_iter_stats(self):
        dim = self.stats.dim
        self.within_var_stats = np.zeros((dim, dim))
        self.within_var_count = 0.0
        self.between_var_stats = np.zeros((dim, dim))
        self.between_var_count = 0.0

    def _get_stats_from_intra_class(self):
        self.within_var_stats += self.stats.offset_scatter
        self.within_var_count += (self.stats.example_weight
                                  - self.stats.class_weight)

    def _get_stats_from_class_means(self):
        between_var_inv = np.linalg.inv(self.between_var)
        within_var_inv = np.linalg.inv(self.within_var)
        for weight, mean, n in self.stats.class_info:
            # mixed_var = (between_var^{-1} + n within_var^{-1})^{-1}
            mixed_var = np.linalg.inv(between_var_inv + n * within_var_inv)
            # m = class mean, minus the (class-weighted) global mean
            m = mean - self.stats.sum_ / self.stats.class_weight
            # w = mixed_var · n · within_var^{-1} · m
            temp = n * (within_var_inv @ m)
            w = mixed_var @ temp
            m_w = m - w
            self.between_var_stats += weight * mixed_var
            self.between_var_stats += weight * np.outer(w, w)
            self.between_var_count += weight
            self.within_var_stats += (weight * n) * mixed_var
            self.within_var_stats += (weight * n) * np.outer(m_w, m_w)
            self.within_var_count += weight

    def _estimate_from_stats(self):
        self.within_var = self.within_var_stats / self.within_var_count
        self.between_var = self.between_var_stats / self.between_var_count

    def estimate_one_iter(self):
        self._reset_per_iter_stats()
        self._get_stats_from_intra_class()
        self._get_stats_from_class_means()
        self._estimate_from_stats()

    def estimate(self, num_em_iters=10):
        for _ in range(num_em_iters):
            self.estimate_one_iter()
        return self.get_output()

    def get_output(self):
        """PldaEstimator::GetOutput → a Plda model."""
        mean = self.stats.sum_ / self.stats.class_weight
        # ComputeNormalizingTransform (plda.cc flavor): covar = C Cᵀ
        # (Cholesky), transform1 = C^{-1} — lower triangular
        C = np.linalg.cholesky(self.within_var)
        transform1 = np.linalg.inv(C)
        between_var_proj = transform1 @ self.between_var @ transform1.T
        # symmetric eig, sorted descending (SortSvd)
        s, U = np.linalg.eigh(between_var_proj)
        order = np.argsort(s)[::-1]
        s = s[order]
        U = U[:, order]
        # s.ApplyFloor(0.0) with a warning in Kaldi
        s = np.maximum(s, 0.0)
        transform = U.T @ transform1
        return Plda(mean=mean, transform=transform, psi=s)


# ---------------------------------------------------------------------------
# plda.cc: scoring
# ---------------------------------------------------------------------------


class Plda:
    def __init__(self, mean, transform, psi):
        self.mean = np.asarray(mean, np.float64)
        self.transform = np.asarray(transform, np.float64)
        self.psi = np.asarray(psi, np.float64)

    def dim(self):
        return self.mean.shape[0]

    def get_normalization_factor(self, transformed_ivector, num_examples):
        """Plda::GetNormalizationFactor."""
        transformed_ivector_sq = transformed_ivector ** 2
        inv_covar = 1.0 / (self.psi + 1.0 / num_examples)
        dot_prod = float(inv_covar @ transformed_ivector_sq)
        return np.sqrt(self.dim() / dot_prod)

    def transform_ivector(self, ivector, num_examples, normalize_length=True,
                          simple_length_norm=False):
        """Plda::TransformIvector (PldaConfig defaults: normalize_length
        true, simple_length_norm false)."""
        transformed = self.transform @ (np.asarray(ivector, np.float64)
                                        - self.mean)
        if normalize_length:
            if simple_length_norm:
                normalization_factor = (np.sqrt(self.dim())
                                        / np.linalg.norm(transformed))
            else:
                normalization_factor = self.get_normalization_factor(
                    transformed, num_examples)
            transformed = transformed * normalization_factor
        return transformed

    def log_likelihood_ratio(self, transformed_train_ivector, n,
                             transformed_test_ivector):
        """Plda::LogLikelihoodRatio — both ivectors already transformed."""
        dim = self.dim()
        psi = self.psi
        # given-class branch: test ~ N(mean, variance)
        mean = (n * psi / (n * psi + 1.0)) * transformed_train_ivector
        variance = 1.0 + psi / (n * psi + 1.0)
        logdet = float(np.sum(np.log(variance)))
        sqdiff = (transformed_test_ivector - mean) ** 2
        loglike_given_class = -0.5 * (logdet + M_LOG_2PI * dim
                                      + float(np.sum(sqdiff / variance)))
        # without-class branch: test ~ N(0, 1 + psi)
        sqdiff = transformed_test_ivector ** 2
        variance = 1.0 + psi
        logdet = float(np.sum(np.log(variance)))
        loglike_without_class = -0.5 * (logdet + M_LOG_2PI * dim
                                        + float(np.sum(sqdiff / variance)))
        return loglike_given_class - loglike_without_class


def ivector_compute_plda(spk2utt, utt2ivector, num_em_iters=10):
    """The ivector-compute-plda main loop: one AddSamples(1.0, ·) per
    speaker, Sort, estimate."""
    dim = len(next(iter(utt2ivector.values())))
    stats = PldaStats(dim)
    for spk in spk2utt:
        utts = spk2utt[spk]
        group = np.stack([utt2ivector[u] for u in utts])
        stats.add_samples(1.0, group)
    stats.sort()
    return PldaEstimator(stats).estimate(num_em_iters)


def ivector_plda_scoring(plda, train_ivectors, test_ivectors, trials,
                         num_utts=None, normalize_length=True,
                         simple_length_norm=False):
    """ivector-plda-scoring main loop (run.sh:346-350 flags: plain per-
    utterance train ivectors, so num_examples defaults to 1)."""
    transformed_train = {}
    n_of = {}
    for key, vec in train_ivectors.items():
        n = (num_utts or {}).get(key, 1)
        n_of[key] = n
        transformed_train[key] = plda.transform_ivector(
            vec, n, normalize_length, simple_length_norm)
    transformed_test = {
        key: plda.transform_ivector(vec, 1, normalize_length,
                                    simple_length_norm)
        for key, vec in test_ivectors.items()}
    scores = []
    for a, b in trials:
        scores.append(plda.log_likelihood_ratio(
            transformed_train[a], n_of[a], transformed_test[b]))
    return np.asarray(scores)


# ---------------------------------------------------------------------------
# ivector-compute-lda.cc
# ---------------------------------------------------------------------------


class CovarianceStats:
    def __init__(self, dim):
        self.tot_covar = np.zeros((dim, dim))
        self.between_covar = np.zeros((dim, dim))
        self.num_spk = 0
        self.num_utt = 0

    def acc_stats(self, utts_of_this_spk):
        """CovarianceStats::AccStats (ivectors already mean-subtracted)."""
        utts = np.asarray(utts_of_this_spk, np.float64)
        num_utts = utts.shape[0]
        self.tot_covar += utts.T @ utts
        spk_average = utts.sum(axis=0) / num_utts
        self.between_covar += num_utts * np.outer(spk_average, spk_average)
        self.num_utt += num_utts
        self.num_spk += 1

    def get_total_covar(self):
        return self.tot_covar / self.num_utt

    def get_within_covar(self):
        return (self.tot_covar - self.between_covar) / self.num_utt


def compute_normalizing_transform(covar, floor):
    """ivector-compute-lda.cc ComputeNormalizingTransform: eig, floor
    eigenvalues at floor*s_max, proj = diag(s^{-0.5}) Uᵀ."""
    s, U = np.linalg.eigh(covar)
    order = np.argsort(s)[::-1]  # SortSvd
    s = s[order]
    U = U[:, order]
    s = np.maximum(s, floor * s[0])
    s = s ** -0.5
    return np.diag(s) @ U.T


def ivector_compute_lda(utt2ivector, utt2spk, lda_dim,
                        total_covariance_factor=0.1, covariance_floor=1.0e-6):
    """ivector-compute-lda main: ComputeAndSubtractMean, then
    ComputeLdaTransform.  Returns (matrix (lda_dim, dim), mean)."""
    keys = list(utt2ivector)
    mean = np.mean([utt2ivector[k] for k in keys], axis=0)
    centered = {k: np.asarray(utt2ivector[k], np.float64) - mean
                for k in keys}
    dim = mean.shape[0]
    stats = CovarianceStats(dim)
    spk2utt = {}
    for k in keys:
        spk2utt.setdefault(utt2spk[k], []).append(k)
    for spk, utts in spk2utt.items():
        stats.acc_stats(np.stack([centered[u] for u in utts]))
    total_covar = stats.get_total_covar()
    within_covar = stats.get_within_covar()
    # mat_to_normalize = f·total + (1-f)·within
    mat_to_normalize = (total_covariance_factor * total_covar
                        + (1.0 - total_covariance_factor) * within_covar)
    T = compute_normalizing_transform(mat_to_normalize, covariance_floor)
    between_covar = total_covar - within_covar
    between_covar_proj = T @ between_covar @ T.T
    s, U = np.linalg.eigh(between_covar_proj)
    order = np.argsort(s)[::-1]  # SortSvd
    s = s[order]
    U = U[:, order]
    # (Kaldi warns on negative eigenvalues but does not floor them here)
    # transform = (top lda_dim rows of Uᵀ) · T
    transform = U.T[:lda_dim] @ T
    return transform, mean
