package graft.core.secrets

/** Secrets resolution (reference: the core/secrets package +
  * core/config/secret_resolver.py).
  *
  * `secret://PROVIDER/KEY` references inside config values are rewritten
  * to resolved secrets; providers are pluggable (env built-in; AWS/Vault
  * are optional extras in the reference and are represented here by the
  * provider SPI — wiring real SDKs is deployment-specific). Resolution
  * goes through a TTL cache and an optional audit wrapper.
  */
trait SecretsProvider {
  def name: String
  def getSecret(key: String): Option[String]
}

/** Environment-variable provider (core/secrets/providers.py:16-40). */
final class EnvSecretsProvider(env: String => Option[String] = sys.env.get)
  extends SecretsProvider {
  val name = "env"
  def getSecret(key: String): Option[String] = env(key)
}

final case class SecretNotFoundError(provider: String, key: String)
  extends RuntimeException(s"secret $key not found in provider $provider")

/** The provider's SDK is not on the classpath. Mirrors the reference's
  * lazy `import boto3` / `import hvac` inside the first resolve
  * (providers.py:60-63, :115-118): construction always succeeds; the
  * missing dependency surfaces on first use with an actionable message.
  */
final case class ProviderUnavailableError(provider: String, detail: String)
  extends RuntimeException(s"secrets provider '$provider' unavailable: $detail")

/** AWS Secrets Manager provider contract (providers.py:44-99). The SDK
  * call is injected (the AWS SDK is an optional extra in the reference
  * too); [[AwsSecretsProvider.reflective]] wires the real SDK when it is
  * on the classpath.
  */
final class AwsSecretsProvider(fetch: String => Option[String])
  extends SecretsProvider {
  val name = "aws"
  def getSecret(key: String): Option[String] = fetch(key)
}

object AwsSecretsProvider {
  private val ClientClass =
    "software.amazon.awssdk.services.secretsmanager.SecretsManagerClient"
  private val RequestClass =
    "software.amazon.awssdk.services.secretsmanager.model.GetSecretValueRequest"

  /** Production wiring: reflectively load AWS SDK v2 on FIRST use (the
    * reference's lazy-import pattern — construction never fails, a
    * missing SDK raises at resolve time). `load` is injectable so specs
    * can exercise the not-on-classpath path deterministically.
    */
  def reflective(load: String => Class[_] = Class.forName(_)): AwsSecretsProvider = {
    lazy val client: AnyRef = {
      val cls = try load(ClientClass) catch {
        case _: ClassNotFoundException | _: NoClassDefFoundError =>
          throw ProviderUnavailableError("aws",
            s"$ClientClass not on classpath — add the AWS SDK v2 " +
              "secretsmanager artifact (the reference requires boto3 the same way)")
      }
      cls.getMethod("create").invoke(null)
    }
    new AwsSecretsProvider(key => {
      val c = client // force the lazy SDK load (and its unavailable error) first
      val reqCls = load(RequestClass)
      val b = reqCls.getMethod("builder").invoke(null)
      val b2 = b.getClass.getMethod("secretId", classOf[String]).invoke(b, key)
      val req = b2.getClass.getMethod("build").invoke(b2)
      val resp = c.getClass.getMethods
        .find(m => m.getName == "getSecretValue" && m.getParameterCount == 1 &&
          m.getParameterTypes()(0).isAssignableFrom(reqCls))
        .getOrElse(throw ProviderUnavailableError("aws",
          "SDK getSecretValue(request) signature not found"))
        .invoke(c, req)
      Option(resp.getClass.getMethod("secretString").invoke(resp))
        .map(_.asInstanceOf[String])
    })
  }
}

/** Vault KV-v2 provider contract with the reference's `path:field`
  * key syntax (providers.py:104-149): "secret/data/db:password" reads
  * field `password` at path `secret/data/db`. `readPath` returns the
  * field map at a path; production wires it to a Vault client.
  */
final class VaultSecretsProvider(readPath: String => Option[Map[String, String]])
  extends SecretsProvider {
  val name = "vault"
  def getSecret(key: String): Option[String] = {
    val (path, field) = key.lastIndexOf(':') match {
      case -1 => (key, "value")
      case i => (key.substring(0, i), key.substring(i + 1))
    }
    readPath(path).flatMap(_.get(field))
  }
}

object VaultSecretsProvider {
  private val VaultClass = "com.bettercloud.vault.Vault"
  private val ConfigClass = "com.bettercloud.vault.VaultConfig"

  /** Production wiring over the BetterCloud Vault driver (KV v2),
    * reflectively loaded on FIRST read — same lazy-import contract as
    * [[AwsSecretsProvider.reflective]] and the reference's `import hvac`
    * (providers.py:115-118). `mountPoint` prefixes paths the way the
    * reference's `mount_point` does.
    */
  def reflective(
      url: String, token: String,
      mountPoint: String = "secret",
      load: String => Class[_] = Class.forName(_)): VaultSecretsProvider = {
    require(url.nonEmpty, "url is required")
    lazy val vault: AnyRef = {
      val (vCls, cCls) = try (load(VaultClass), load(ConfigClass)) catch {
        case _: ClassNotFoundException | _: NoClassDefFoundError =>
          throw ProviderUnavailableError("vault",
            s"$VaultClass not on classpath — add the vault-java-driver " +
              "artifact (the reference requires hvac the same way)")
      }
      val cfg0 = cCls.getConstructor().newInstance().asInstanceOf[AnyRef]
      val cfg1 = cCls.getMethod("address", classOf[String]).invoke(cfg0, url)
      val cfg2 = cCls.getMethod("token", classOf[String]).invoke(cfg1, token)
      val cfg = cCls.getMethod("build").invoke(cfg2)
      vCls.getConstructor(cCls).newInstance(cfg).asInstanceOf[AnyRef]
    }
    new VaultSecretsProvider(path => {
      val logical = vault.getClass.getMethod("logical").invoke(vault)
      val resp = logical.getClass
        .getMethod("read", classOf[String])
        .invoke(logical, s"$mountPoint/data/$path")
      val data = resp.getClass.getMethod("getData").invoke(resp)
        .asInstanceOf[java.util.Map[String, String]]
      if (data == null || data.isEmpty) None
      else Some(scala.jdk.CollectionConverters.MapHasAsScala(data).asScala.toMap)
    })
  }
}

/** TTL cache (core/secrets/resolver.py:48-98); clock injectable. */
final class SecretsCache(
    ttlSeconds: Double,
    clock: () => Double = () => System.nanoTime() / 1e9) {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Double)]()
  def get(key: String): Option[String] =
    Option(cache.get(key)).collect {
      case (v, at) if clock() - at < ttlSeconds => v
    }
  def put(key: String, value: String): Unit =
    cache.put(key, (value, clock()))
  def invalidate(): Unit = cache.clear()
}

/** Provider-dispatching resolver with cache (core/secrets/resolver.py:17-45). */
final class SecretsResolver(
    providers: Seq[SecretsProvider],
    cacheTtlSeconds: Double = 300.0,
    clock: () => Double = () => System.nanoTime() / 1e9,
    onAccess: (String, String, Boolean) => Unit = (_, _, _) => ()) {

  private val byName = providers.map(p => p.name -> p).toMap
  private val cache = new SecretsCache(cacheTtlSeconds, clock)

  def resolve(provider: String, key: String): String = {
    val cacheKey = s"$provider/$key"
    cache.get(cacheKey) match {
      case Some(v) =>
        onAccess(provider, key, true)
        v
      case None =>
        val p = byName.getOrElse(provider,
          throw SecretNotFoundError(provider, key))
        val v = p.getSecret(key).getOrElse {
          onAccess(provider, key, false)
          throw SecretNotFoundError(provider, key)
        }
        cache.put(cacheKey, v)
        onAccess(provider, key, true)
        v
    }
  }
}

/** `secret://PROVIDER/KEY` rewriting over a parsed config tree
  * (core/config/secret_resolver.py:31-111). Values that are exactly a
  * reference are replaced; inline occurrences inside longer strings are
  * substituted too.
  */
object SecretRefResolver {
  /** Exact-value reference: the whole config value is one ref. Key may
    * contain ':' (Vault's `path:field` syntax, providers.py:104-149).
    */
  private val ExactRef = "secret://([A-Za-z0-9_-]+)/(\\S+)".r
  /** Inline reference embedded in a longer string: key stops at ':' so
    * surrounding text like ":5432" in a JDBC URL isn't swallowed.
    *
    * Inline refs therefore do NOT support Vault's `path:field` key syntax
    * (only exact-value refs do). `:digits` after the key is allowed — a
    * port in a URL — but `:identifier` is indistinguishable from a Vault
    * field selector, would silently resolve a DIFFERENT secret than the
    * same ref as a whole value, and is rejected loudly below.
    */
  private val InlineRef = "secret://([A-Za-z0-9_-]+)/([^\\s:\"]+)(:?)".r

  def parseRef(s: String): Option[(String, String)] = s match {
    case ExactRef(p, k) if s"secret://$p/$k" == s => Some((p, k))
    case _ => None
  }

  def rewrite(tree: Map[String, Any], resolver: SecretsResolver): Map[String, Any] = {
    def walk(v: Any): Any = v match {
      case s: String =>
        parseRef(s) match {
          case Some((p, k)) => resolver.resolve(p, k)
          case None => InlineRef.replaceAllIn(s, m => {
            val after = s.drop(m.end)
            if (m.group(3) == ":" && after.headOption.exists(c => !c.isDigit))
              throw new IllegalArgumentException(
                s"inline secret ref 'secret://${m.group(1)}/${m.group(2)}:…' " +
                  "looks like Vault path:field syntax, which inline refs do not " +
                  "support — use an exact-value reference for field selectors")
            scala.util.matching.Regex.quoteReplacement(
              resolver.resolve(m.group(1), m.group(2))) + m.group(3)
          })
        }
      case m: Map[String @unchecked, Any @unchecked] =>
        m.map { case (k, x) => k -> walk(x) }
      case l: List[Any @unchecked] => l.map(walk)
      case other => other
    }
    walk(tree).asInstanceOf[Map[String, Any]]
  }
}
