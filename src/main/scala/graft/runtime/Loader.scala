package graft.runtime

import graft.core.component._

/** Reflective component loading (reference: runtime/loader.py:15-137).
  *
  * `class_path` resolution order:
  *  1. a registered factory (explicit registry — the JVM-safe default);
  *  2. a Scala companion object implementing ComponentFactory
  *     (`Class.forName(path + "$")`);
  *  3. a class with a (Map[String,Any]) constructor;
  *  4. a class with a no-arg constructor (config ignored).
  *
  * Mirrors the reference's preference for `from_config(dict)` over
  * **kwargs construction (loader.py:78-86).
  */
object ComponentLoader {

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, ComponentFactory]()

  def register(path: String, factory: ComponentFactory): Unit =
    registry.put(path, factory)

  def register(path: String, factory: Map[String, Any] => PipelineComponent): Unit =
    registry.put(path, new ComponentFactory {
      def fromConfig(c: Map[String, Any]): PipelineComponent = factory(c)
    })

  def resolve(path: String): ComponentFactory = {
    val reg = registry.get(path)
    if (reg != null) return reg
    val companion =
      try {
        val cls = Class.forName(path + "$")
        cls.getField("MODULE$").get(null) match {
          case f: ComponentFactory => Some(f)
          case _ => None
        }
      } catch { case _: ReflectiveOperationException => None }
    companion.getOrElse {
      val cls =
        try Class.forName(path)
        catch {
          case e: ClassNotFoundException =>
            throw ComponentNotFoundError(s"class not found: $path (${e.getMessage})")
        }
      if (!classOf[PipelineComponent].isAssignableFrom(cls))
        throw ComponentInstantiationError(
          s"$path does not implement PipelineComponent")
      new ComponentFactory {
        def fromConfig(c: Map[String, Any]): PipelineComponent =
          try {
            val mapCtor = cls.getConstructors.find(
              k => k.getParameterCount == 1 &&
                k.getParameterTypes()(0).isAssignableFrom(classOf[Map[String, Any]]))
            mapCtor match {
              case Some(k) => k.newInstance(c).asInstanceOf[PipelineComponent]
              case None =>
                cls.getDeclaredConstructor().newInstance().asInstanceOf[PipelineComponent]
            }
          } catch {
            case e: ReflectiveOperationException =>
              throw ComponentInstantiationError(s"cannot instantiate $path", e)
          }
      }
    }
  }

  def load(path: String, config: Map[String, Any]): PipelineComponent = {
    val c = resolve(path).fromConfig(config)
    if (c == null)
      throw ComponentInstantiationError(s"factory for $path returned null")
    c
  }

  /** Pre-flight warnings for a component class path — loadable but
    * suspicious shapes (reference: loader.py:88-113). Unloadable paths
    * still throw, exactly as `validate_component_class` does.
    */
  def validateComponentClass(path: String): List[String] = {
    if (registry.get(path) != null) return Nil
    val warnings = scala.collection.mutable.ListBuffer[String]()
    val companion =
      try Class.forName(path + "$").getField("MODULE$").get(null)
        .isInstanceOf[ComponentFactory]
      catch { case _: ReflectiveOperationException => false }
    if (!companion) {
      val cls =
        try Class.forName(path)
        catch {
          case e: ClassNotFoundException =>
            throw ComponentNotFoundError(s"class not found: $path (${e.getMessage})")
        }
      warnings += s"'$path' has no ComponentFactory companion; will fall back to constructor instantiation"
      if (java.lang.reflect.Modifier.isAbstract(cls.getModifiers))
        warnings += s"'$path' is abstract and cannot be instantiated"
      if (!classOf[PipelineComponent].isAssignableFrom(cls))
        warnings += s"'$path' does not implement PipelineComponent"
    }
    warnings.toList
  }

  /** All concrete [[PipelineComponent]] classes directly inside a package
    * (reference: loader.py:115-137 `list_available_components`). The JVM
    * analogue of scanning a module's vars: enumerate the package's
    * `.class` resources across classpath directories AND jars, load each
    * candidate, keep non-abstract PipelineComponent subtypes. Nested and
    * companion classes (names containing '$') are skipped, like the
    * reference skips module-private names. Raises if the package has no
    * classpath presence (the reference's ImportError path).
    */
  def listAvailableComponents(
      pkg: String,
      loader: ClassLoader = Thread.currentThread.getContextClassLoader): List[String] = {
    import scala.jdk.CollectionConverters._
    val rel = pkg.replace('.', '/')
    val urls = loader.getResources(rel).asScala.toList
    if (urls.isEmpty)
      throw ComponentNotFoundError(s"package not found on classpath: $pkg")
    val classFiles: List[String] = urls.flatMap { url =>
      url.getProtocol match {
        case "file" =>
          val dir = new java.io.File(url.toURI)
          Option(dir.listFiles()).toList.flatten
            .filter(f => f.isFile && f.getName.endsWith(".class"))
            .map(_.getName.stripSuffix(".class"))
        case "jar" =>
          val conn = url.openConnection().asInstanceOf[java.net.JarURLConnection]
          val jar = conn.getJarFile
          jar.entries().asScala
            .map(_.getName)
            .filter(n => n.startsWith(rel + "/") && n.endsWith(".class") &&
              !n.drop(rel.length + 1).contains('/')) // direct children only
            .map(_.drop(rel.length + 1).stripSuffix(".class"))
            .toList
        case _ => Nil
      }
    }
    classFiles.distinct
      .filterNot(_.contains('$'))
      .flatMap { simple =>
        val fqcn = s"$pkg.$simple"
        try {
          val cls = Class.forName(fqcn, false, loader)
          if (classOf[PipelineComponent].isAssignableFrom(cls) &&
              !java.lang.reflect.Modifier.isAbstract(cls.getModifiers) &&
              !cls.isInterface && cls != classOf[PipelineComponent])
            Some(fqcn)
          else None
        } catch { case _: LinkageError | _: ClassNotFoundException => None }
      }
      .sorted
  }
}
