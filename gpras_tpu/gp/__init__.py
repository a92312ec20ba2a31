"""GP model core: exact GP, sparse (collapsed-ELBO) GP, minibatch SVGP, priors, high-level model."""
