from relationprediction_tpu import config as config_lib

GCN_BLOCK_EXP = "/root/reference/settings/gcn_block.exp"
GCN_BASIS_EXP = "/root/reference/settings/gcn_basis.exp"
DISTMULT_EXP = "/root/reference/settings/distmult.exp"
COMPLEX_EXP = "/root/reference/settings/complex.exp"


def test_parse_gcn_block():
    cfg = config_lib.load(GCN_BLOCK_EXP)
    assert cfg.encoder.name == "gcn_basis"
    assert cfg.encoder.concatenation
    assert cfg.encoder.gcn_variant == "block"
    assert cfg.encoder.n_bases == 100
    assert cfg.encoder.n_layers == 2
    assert cfg.encoder.internal_dimension == 500
    assert cfg.encoder.code_dimension == 500
    assert cfg.encoder.use_input_transform
    assert not cfg.encoder.use_output_transform
    assert cfg.encoder.dropout_keep_probability == 0.8
    assert cfg.decoder.name == "bilinear-diag"
    assert cfg.decoder.regularization_parameter == 0.01
    assert cfg.optimizer.algorithm == "Adam"
    assert cfg.optimizer.learning_rate == 0.01
    assert cfg.optimizer.max_gradient_norm == 1.0
    assert cfg.optimizer.early_stopping_check_every == 2000
    assert cfg.optimizer.early_stopping_burnin == 6000
    assert cfg.optimizer.report_train_loss_every == 100
    assert cfg.training.negative_sample_rate == 10
    assert cfg.training.graph_batch_size == 30000
    assert cfg.training.graph_split_size == 0.5
    assert cfg.training.metric == "MRR"


def test_parse_gcn_basis():
    cfg = config_lib.load(GCN_BASIS_EXP)
    assert cfg.encoder.gcn_variant == "basis"
    assert cfg.encoder.n_bases == 5


def test_parse_distmult():
    cfg = config_lib.load(DISTMULT_EXP)
    assert cfg.encoder.name == "embedding"
    assert cfg.decoder.name == "bilinear-diag"
    assert cfg.decoder.code_dimension == 500  # via Shared merge


def test_parse_complex():
    cfg = config_lib.load(COMPLEX_EXP)
    assert cfg.decoder.name == "complex"


def test_with_counts():
    cfg = config_lib.load(DISTMULT_EXP).with_counts(100, 10, 1000)
    assert cfg.entity_count == 100
    assert cfg.relation_count == 10
    assert cfg.edge_count == 1000


def test_variant_precedence():
    from relationprediction_tpu.config import EncoderConfig
    assert EncoderConfig(add_diagonal=True, concatenation=True).gcn_variant \
        == "basis_plus_diag"
    assert EncoderConfig(diagonal_coefficients=True).gcn_variant \
        == "basis_times_diag"
    assert EncoderConfig(store_edge_data=True).gcn_variant == "basis_stored"
    assert EncoderConfig(concatenation=True).gcn_variant == "block"
    assert EncoderConfig().gcn_variant == "basis"
