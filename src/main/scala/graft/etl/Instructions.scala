package graft.etl

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Stage-5 side output S9 (ref: src/etl_functions.py:442-559): the BI
  * integration instructions file the reference emits alongside the data
  * exports. Pure static content — reproduced byte-for-byte from the
  * reference's generator string (`:461-548`) as *output parity*, the same
  * contract the golden CSVs satisfy; there is no compute to re-express.
  * (The reference repo's committed copy of the file is empty; the
  * generator string is the source of truth, and the spec compares against
  * the string extracted from the reference source.)
  */
object Instructions {

  val content: String =
    """# Instruções para Integração com Power BI
      |
      |## 1. Importação de Dados
      |
      |### Opção 1: Importar arquivos Parquet (Recomendado)
      |1. Abra o Power BI Desktop
      |2. Clique em "Obter Dados" > "Mais..." > "Arquivo" > "Parquet"
      |3. Navegue até a pasta `data/transformed`
      |4. Selecione os arquivos .parquet:
      |   - fact_sales.parquet
      |   - dim_customer.parquet
      |   - dim_product.parquet
      |   - dim_seller.parquet
      |   - dim_date.parquet
      |   - dim_order.parquet
      |   - dim_review.parquet
      |
      |### Opção 2: Importar arquivos CSV
      |1. Abra o Power BI Desktop
      |2. Clique em "Obter Dados" > "Texto/CSV"
      |3. Navegue até a pasta `data/transformed`
      |4. Selecione os arquivos .csv (mesmos nomes acima, com extensão .csv)
      |
      |## 2. Configuração do Modelo de Dados
      |
      |### Configurar Relações
      |1. Vá para a visualização "Modelo" (ícone de diagrama no lado esquerdo)
      |2. Crie as seguintes relações:
      |   - fact_sales[customer_id] → dim_customer[id]
      |   - fact_sales[product_id] → dim_product[id]
      |   - fact_sales[seller_id] → dim_seller[id]
      |   - fact_sales[date_id] → dim_date[id]
      |   - fact_sales[order_id] → dim_order[id]
      |
      |### Criar Medidas Calculadas
      |1. Clique com o botão direito na tabela fact_sales > "Nova medida"
      |2. Crie as seguintes medidas:
      |
      |```
      |Total Vendas = SUM(fact_sales[price])
      |Total Frete = SUM(fact_sales[freight_value])
      |Número de Pedidos = DISTINCTCOUNT(fact_sales[order_id])
      |Ticket Médio = DIVIDE([Total Vendas], [Número de Pedidos])
      |Percentual de Frete = DIVIDE([Total Frete], [Total Vendas]) * 100
      |```
      |
      |## 3. Criação do Dashboard
      |
      |### Página 1: Visão Geral
      |1. Adicione cartões com as principais métricas:
      |   - Total de Vendas
      |   - Número de Pedidos
      |   - Ticket Médio
      |   - Percentual de Frete
      |2. Adicione um gráfico de linhas para mostrar a tendência de vendas ao longo do tempo
      |3. Adicione um gráfico de barras para as top 10 categorias de produtos
      |4. Adicione um mapa para mostrar vendas por estado
      |
      |### Página 2: Análise de Produtos
      |1. Adicione uma tabela com as categorias de produtos e suas métricas
      |2. Adicione um gráfico de dispersão relacionando preço e frete
      |3. Adicione um gráfico de barras para os produtos mais vendidos
      |
      |### Página 3: Análise de Clientes
      |1. Adicione um mapa de calor de vendas por estado e cidade
      |2. Adicione um gráfico de pizza para distribuição de avaliações
      |3. Adicione um gráfico de barras para relação entre avaliação e tempo de entrega
      |
      |## 4. Adicionar Segmentações de Dados
      |1. Adicione segmentações para:
      |   - Período (ano, trimestre, mês)
      |   - Categoria de produto
      |   - Estado do cliente
      |   - Faixa de preço
      |
      |## 5. Formatação e Finalização
      |1. Aplique um tema consistente (Arquivo > Opções e configurações > Mudar tema)
      |2. Adicione título e descrições a cada visualização
      |3. Organize as visualizações de forma lógica e atraente
      |4. Adicione botões de navegação entre páginas
      |
      |## 6. Salvar e Compartilhar
      |1. Salve o arquivo .pbix na pasta `reports/dashboard`
      |2. Para compartilhar, você pode:
      |   - Publicar no Power BI Service (requer conta)
      |   - Exportar como PDF para relatórios estáticos
      |   - Compartilhar o arquivo .pbix diretamente
      |""".stripMargin

  /** Write `reports/dashboard/power_bi_instructions.md` under outDir
    * (driver-local filesystem — a single static file, not a Spark job). */
  def write(outDir: String): Unit = {
    val dir = Paths.get(outDir, "reports", "dashboard")
    Files.createDirectories(dir)
    Files.write(dir.resolve("power_bi_instructions.md"),
      content.getBytes(StandardCharsets.UTF_8))
  }
}
