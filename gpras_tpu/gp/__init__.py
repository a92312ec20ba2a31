"""GP model core: exact GP, sparse (collapsed-ELBO) GP, priors, high-level model."""
